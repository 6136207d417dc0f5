"""Every bundled example config must construct (smoke; checkpoint paths are
placeholders, so only config-build is exercised)."""

from pathlib import Path

import pytest

from xtuner_tpu.utils.config import Config

EXAMPLES = sorted((Path(__file__).parents[2] / "examples" / "v1").glob("*.py"))


@pytest.mark.parametrize("path", EXAMPLES, ids=[p.stem for p in EXAMPLES])
def test_example_config_builds(path):
    cfg = Config.fromfile(str(path))
    trainer = cfg["trainer"]
    assert hasattr(trainer, "build")
    assert trainer.model_cfg is not None
