"""The mechanical compile-freeze guard (round-3 VERDICT #10).

The documented worker-wedge trigger is a client-interrupted remote kernel
compile; `make freeze` must make experiment scripts refuse to start, while
bench.py / tpu_parity.py (cache-warm fixed shapes) stay runnable.
"""

import os

import pytest

from phys_autodiff_tpu.utils import freeze


@pytest.fixture
def freeze_file(tmp_path, monkeypatch):
    path = tmp_path / "FREEZE"
    monkeypatch.setattr(freeze, "FREEZE_PATH", str(path))
    return path


def test_not_frozen_is_noop(freeze_file):
    assert freeze.freeze_active() is False
    freeze.assert_not_frozen("scripts/x.py")  # must not raise


def test_frozen_blocks_with_rc3(freeze_file, capsys):
    freeze_file.write_text("2026-08-20")
    assert freeze.freeze_active() is True
    with pytest.raises(SystemExit) as exc:
        freeze.assert_not_frozen("scripts/dma_experiments.py")
    assert exc.value.code == 3
    assert "COMPILE FREEZE" in capsys.readouterr().err


def test_override_env_allows(freeze_file, monkeypatch, capsys):
    freeze_file.write_text("2026-08-20")
    monkeypatch.setenv("FREEZE_OVERRIDE", "1")
    freeze.assert_not_frozen("scripts/x.py")  # must not raise
    assert "override" in capsys.readouterr().err


def test_bench_and_parity_are_exempt():
    """bench.py / tpu_parity.py must NOT import the guard — they are the
    protected capture itself."""
    for fname in ("bench.py", os.path.join("scripts", "tpu_parity.py")):
        src = open(os.path.join("/root/repo", fname)).read()
        assert "assert_not_frozen" not in src, fname


def test_experiment_scripts_are_guarded():
    for fname in ("dma_experiments.py", "ngp_profile.py", "fit_ladder.py",
                  "profile_trace.py", "weak_scaling.py"):
        src = open(os.path.join("/root/repo/scripts", fname)).read()
        assert "assert_not_frozen" in src, fname
