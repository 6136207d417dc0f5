"""Legacy CLI modes: log-dataset / check-custom-dataset / list-cfg / copy-cfg
+ the activation-stats recorder."""

import json

import pytest

from xtuner_tpu.train.cli import dataset_tools


@pytest.fixture
def data_file(tmp_path):
    f = tmp_path / "d.jsonl"
    rows = [
        {"messages": [{"role": "user", "content": "hi"},
                      {"role": "assistant", "content": "hello there"}]},
        {"messages": [{"role": "user", "content": "2+2?"},
                      {"role": "assistant", "content": "4"}]},
    ]
    f.write_text("\n".join(json.dumps(r) for r in rows))
    return f


def test_log_dataset(data_file, capsys):
    dataset_tools.log_dataset(["--dataset", str(data_file), "--num-samples", "1"])
    out = capsys.readouterr().out
    assert "sample 0" in out and "hello there" in out
    assert "[supervised]" in out


def test_check_custom_dataset_ok(data_file, capsys):
    dataset_tools.check_custom_dataset(["--dataset", str(data_file)])
    assert "OK" in capsys.readouterr().out


def test_check_custom_dataset_bad(tmp_path, capsys):
    f = tmp_path / "bad.jsonl"
    f.write_text("\n".join([
        "not json",
        json.dumps({"messages": [{"role": "user", "content": "no answer"}]}),
        json.dumps({"nope": 1}),
    ]))
    with pytest.raises(SystemExit):
        dataset_tools.check_custom_dataset(["--dataset", str(f)])
    out = capsys.readouterr().out
    assert "invalid json" in out and "no assistant turn" in out and "missing 'messages'" in out


def test_list_and_copy_cfg(tmp_path, capsys):
    dataset_tools.list_cfg([])
    names = capsys.readouterr().out.splitlines()
    assert any(n.endswith(".py") for n in names)
    dataset_tools.copy_cfg([names[0], str(tmp_path)])
    assert any(tmp_path.iterdir())


def test_activation_stats_recorder():
    import jax.numpy as jnp
    import numpy as np

    from xtuner_tpu.profiler.internal_metrics import ActivationStatsRecorder
    from xtuner_tpu.profiler.prober import probe

    rec = ActivationStatsRecorder(interval=2, out_dir="/tmp/act_stats_test")

    def step():
        probe("after_attn", jnp.asarray(np.ones((4, 4), np.float32) * 3.0))

    assert rec.maybe_record(1, step) is None
    stats = rec.maybe_record(2, step)
    assert stats is not None and abs(stats["after_attn/mean"] - 3.0) < 1e-6
