"""bench.py's crash-resilience machinery (round-2 VERDICT #1).

The r02 driver capture died with rc=1 because one late TPU-worker crash lost
the whole ~15-minute suite. These tests pin the contract that prevents a
repeat: a provisional headline exists after the first timed section, every
failure path still emits exactly one parseable JSON line with
"partial": true, and the monotonicity gate checks the per-plane kernel as
ONE family across alignment classes (round-2 ADVICE #1).
"""

import io
import json
import sys

sys.path.insert(0, "/root/repo")
import bench  # noqa: E402
from phys_autodiff_tpu.bench.harness import PhysRow  # noqa: E402


def row(variant, nx, ny, nz, ms):
    return PhysRow(variant, nx, ny, nz, 10, ms)


def test_emitter_headline_math():
    em = bench.Emitter()
    em.set_headline(bench.BASELINE_MS, "fused")
    assert em.headline["vs_baseline"] == 1.0
    assert em.headline["value"] == round(
        bench.N_CELLS_FLAGSHIP / (bench.BASELINE_MS / 1e3) / 1e9, 4
    )
    em.set_headline(bench.BASELINE_MS / 2, "fused")
    assert em.headline["vs_baseline"] == 2.0


def test_emitter_emits_once_and_marks_partial(capsys, monkeypatch):
    em = bench.Emitter()
    em.set_headline(0.04, "fused")
    em.failures.append("pipeline_64x64x64: worker crashed")
    em.emit(partial=True)
    em.emit(partial=False)  # second call must be a no-op
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 1
    parsed = json.loads(out[0])
    assert parsed["partial"] is True
    assert parsed["failures"] == ["pipeline_64x64x64: worker crashed"]
    assert parsed["arm"] == "fused"
    assert parsed["valid"] is True


def test_emitter_without_headline_prints_nothing(capsys):
    em = bench.Emitter()
    em.emit(partial=True)
    assert capsys.readouterr().out == ""


def test_section_failure_records_and_reprobes(monkeypatch):
    probes = []
    monkeypatch.setattr(bench, "probe_device", lambda **kw: probes.append(1) or False)
    monkeypatch.setattr(bench, "EMIT", bench.Emitter())

    def boom():
        raise RuntimeError("UNAVAILABLE: TPU worker process crashed or restarted")

    out, keep = bench.section("phys_64x64x64", 60, boom)
    assert out is None
    assert keep is False  # dead worker -> stop queuing sections
    assert probes == [1]
    assert bench.EMIT.failures and "phys_64x64x64" in bench.EMIT.failures[0]

    # Worker answers the re-probe -> caller should continue.
    monkeypatch.setattr(bench, "probe_device", lambda **kw: True)
    out, keep = bench.section("train", 60, boom)
    assert out is None and keep is True


def test_section_success_passes_through(monkeypatch):
    monkeypatch.setattr(bench, "EMIT", bench.Emitter())
    out, keep = bench.section("ok", 60, lambda a, b: a + b, 2, b=3)
    assert out == 5 and keep is True
    assert bench.EMIT.failures == []


def test_family_merges_plane_labels_across_alignment():
    # ADVICE #1: fused_multistream (aligned) and fused_plane (unaligned)
    # label the SAME per-plane kernel; the gate must chain them.
    a = row("fused_multistream", 128, 96, 96, 1.0)
    b = row("fused_plane", 96, 96, 64, 2.0)
    assert bench.family(a) == bench.family(b)
    # while the one-DMA kernels still split by alignment class
    assert bench.family(row("fused", 128, 96, 96, 1.0)) != bench.family(
        row("fused", 96, 96, 64, 1.0)
    )


def test_monotonic_gate_catches_cross_alignment_plane_dce():
    rows = [
        row("fused_plane", 64, 64, 64, 0.30),
        row("fused_plane", 96, 96, 64, 0.50),
        # larger grid, implausibly faster than the smaller unaligned one:
        row("fused_multistream", 128, 96, 96, 0.10),
    ]
    assert bench.check_monotonic(rows) is False
    rows[-1] = row("fused_multistream", 128, 96, 96, 0.80)
    assert bench.check_monotonic(rows) is True


def test_refresh_headline_picks_best_f32_arm(monkeypatch):
    monkeypatch.setattr(bench, "EMIT", bench.Emitter())
    bench.refresh_headline(
        [
            row("nonfused", 128, 96, 96, 0.40),
            row("fused", 128, 96, 96, 0.042),
            row("fused_bf16io", 128, 96, 96, 0.030),  # excluded: not f32
            row("fused", 64, 64, 64, 0.01),  # excluded: not flagship grid
        ],
        valid=True,
    )
    h = bench.EMIT.headline
    assert h["arm"] == "fused"
    assert abs(h["value"] - bench.N_CELLS_FLAGSHIP / (0.042 / 1e3) / 1e9) < 1e-3
