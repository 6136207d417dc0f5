"""Gate-logic unit tests for __graft_entry__'s HLO structure checks."""

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __graft_entry__ as ge  # noqa: E402


GOOD = """
  %a2a-s = (f32[8]) all-to-all-start(%x), channel_id=1
  %gemm = f32[8,8] dot(%p, %q)
  %a2a-d = f32[8] all-to-all-done(%a2a-s)
"""
EMPTY_WINDOW = """
  %a2a-s = (f32[8]) all-to-all-start(%x), channel_id=1
  %a2a-d = f32[8] all-to-all-done(%a2a-s)
"""
SYNC = "%y = f32[8] all-to-all(%x)"


def test_overlap_counts_compute_inside_async_window():
    assert ge._check_async_overlap(GOOD) == 1


def test_overlap_ignores_sync_lowering():
    # CPU backend emulation: no async pairs -> nothing to assert
    assert ge._check_async_overlap(SYNC) == 0


def test_overlap_flags_empty_windows():
    with pytest.raises(AssertionError):
        ge._check_async_overlap(EMPTY_WINDOW)


def test_fusion_counts_as_compute():
    hlo = GOOD.replace("dot(%p, %q)", "fusion(%p), kind=kOutput")
    assert ge._check_async_overlap(hlo) == 1
