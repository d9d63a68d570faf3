"""Tests for the CLI (phys_autodiff_tpu/cli.py) and the self-describing
model checkpoints behind it (models/modelio.py).

The CLI is exercised in-process via cli.main(argv) (a subprocess would
re-import JAX per test on the 1-core host); each command's JSON contract
is parsed from stdout exactly as a shell user would."""

import json

import jax.numpy as jnp
import numpy as np
import pytest

from phys_autodiff_tpu import cli
from phys_autodiff_tpu.models import modelio, sample
from phys_autodiff_tpu.models.fourier import FourierEncodingConfig
from phys_autodiff_tpu.models.hash_encoder import HashEncodingConfig
from phys_autodiff_tpu.models.ngp import NGPFieldConfig
from phys_autodiff_tpu.train import fit_field as ff
from phys_autodiff_tpu.utils import export
from phys_autodiff_tpu.utils.config import (
    CoordNorm,
    GridSpec,
    MLPDims,
    MLPGridConfig,
)


def _run(capsys, argv):
    rc = cli.main(argv)
    out = capsys.readouterr().out.strip().splitlines()
    return rc, json.loads(out[-1])


# ---------- modelio ----------


def _tiny_grid():
    return GridSpec(nx=8, ny=6, nz=6, hx=0.2, hy=0.2, hz=0.2, dt=1e-3)


def test_modelio_mlp_roundtrip(tmp_path):
    g = _tiny_grid()
    cfg = MLPGridConfig(dims=MLPDims(H=8), norm=CoordNorm.ZeroToOne)
    params = ff.init_any(cfg, seed=3)
    p = str(tmp_path / "m.npz")
    modelio.save_model(p, g, cfg, params)
    g2, cfg2, params2 = modelio.load_model(p)
    assert g2 == g and cfg2 == cfg
    import jax

    for a, b in zip(
        jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(params2)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize(
    "enc",
    [
        HashEncodingConfig(num_levels=2, log2_table_size=8,
                           base_resolution=3, max_resolution=8,
                           dense_oversubscribed=True),
        FourierEncodingConfig(num_frequencies=2, include_input=False),
    ],
)
def test_modelio_ngp_roundtrip(tmp_path, enc):
    g = _tiny_grid()
    cfg = NGPFieldConfig(encoding=enc, hidden=8)
    params = ff.init_any(cfg, seed=1)
    p = str(tmp_path / "n.npz")
    modelio.save_model(p, g, cfg, params)
    g2, cfg2, params2 = modelio.load_model(p)
    assert cfg2 == cfg and g2 == g
    # the restored model must serve identically
    out1 = sample.grid_infer_any(g, cfg, params, 0.25)
    out2 = sample.grid_infer_any(g2, cfg2, params2, 0.25)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))


def test_modelio_rejects_plain_checkpoint(tmp_path):
    from phys_autodiff_tpu.train import checkpoint

    p = str(tmp_path / "plain.npz")
    checkpoint.save_npz(p, {"w": jnp.zeros((3,))})
    with pytest.raises(ValueError, match="format"):
        modelio.load_model(p)


# ---------- CLI ----------


def test_cli_info(capsys):
    rc, out = _run(capsys, ["info"])
    assert rc == 0
    assert out["backend"] == "cpu" and len(out["devices"]) == 8
    assert "mlp" in out["model_families"]
    assert "HashEncodingConfig" in out["model_families"]


def test_cli_train_serve_simulate_export_pipeline(capsys, tmp_path):
    ckpt = str(tmp_path / "model.npz")
    rc, out = _run(capsys, [
        "train", "--grid", "8x6x6", "--steps", "20", "--hidden", "8",
        "--lr", "3e-3", "--out", ckpt,
    ])
    assert rc == 0
    assert np.isfinite(out["loss_last"]) and out["loss_last"] > 0

    # serve the full grid to npz
    snap = str(tmp_path / "snap.npz")
    rc, out = _run(capsys, ["serve", "--ckpt", ckpt, "--t", "0.3",
                            "--out", snap])
    assert rc == 0
    fields, meta = export.load_fields_npz(snap)
    assert fields["sigma"].shape == (6, 6, 8)
    assert fields["u"].shape == (3, 6, 6, 8)
    assert meta["t"] == 0.3

    # serve arbitrary points to npy
    pts = str(tmp_path / "pts.npy")
    np.save(pts, np.random.default_rng(0).uniform(0, 1, (17, 3))
            .astype(np.float32))
    out_npy = str(tmp_path / "vals.npy")
    rc, out = _run(capsys, ["serve", "--ckpt", ckpt, "--points", pts,
                            "--out", out_npy])
    assert rc == 0 and out["points"] == 17
    assert np.load(out_npy).shape == (17, 4)

    # export the served snapshot to VTK
    vtk = str(tmp_path / "snap.vtk")
    rc, out = _run(capsys, ["export", "--input", snap, "--out", vtk])
    assert rc == 0 and sorted(out["fields"]) == ["sigma", "u"]
    assert open(vtk, "rb").read(26).startswith(b"# vtk DataFile Version 3.0")

    # simulate seeded from the checkpoint -> VTK series
    prefix = str(tmp_path / "roll")
    rc, out = _run(capsys, [
        "simulate", "--ckpt", ckpt, "--frames", "2",
        "--steps-per-frame", "2", "--out", prefix,
    ])
    assert rc == 0 and out["frames"] == 2
    series = json.load(open(prefix + ".vtk.series"))
    assert len(series["files"]) == 2
    assert np.isfinite(out["final_max_abs_div"])


def test_cli_simulate_with_obstacles(capsys, tmp_path):
    prefix = str(tmp_path / "obst")
    rc, out = _run(capsys, [
        "simulate", "--grid", "12x8x8", "--frames", "2",
        "--steps-per-frame", "2", "--sim-dt", "0.02",
        "--obstacle", "box:2,2,3:5,5,8",
        "--obstacle", "sphere:6,6,2:0.08",
        "--out", prefix,
    ])
    assert rc == 0 and out["frames"] == 2
    assert np.isfinite(out["final_max_abs_div"])
    series = json.load(open(prefix + ".vtk.series"))
    assert len(series["files"]) == 2

    # malformed obstacle spec -> usage error, not a traceback
    with pytest.raises(SystemExit):
        cli.main([
            "simulate", "--grid", "12x8x8", "--frames", "1",
            "--obstacle", "torus:1,2,3", "--out", prefix + "2",
        ])
    capsys.readouterr()


def test_cli_simulate_with_sources(capsys, tmp_path):
    prefix = str(tmp_path / "src")
    rc, out = _run(capsys, [
        "simulate", "--grid", "12x8x8", "--frames", "2",
        "--steps-per-frame", "2", "--sim-dt", "0.02",
        "--emitter", "2,2,3:4,4,6:5.0",
        "--fan", "2,2,3:4,4,6:1.0,0,0",
        "--obstacle", "box:5,5,6:7,7,10",
        "--out", prefix,
    ])
    assert rc == 0 and out["frames"] == 2
    assert np.isfinite(out["final_max_abs_div"])

    with pytest.raises(SystemExit):
        cli.main([
            "simulate", "--grid", "12x8x8", "--frames", "1",
            "--emitter", "2,2,3:rate", "--out", prefix + "2",
        ])
    capsys.readouterr()


def test_cli_fit_from_snapshot(capsys, tmp_path):
    g = _tiny_grid()
    z, y, x = np.meshgrid(np.arange(g.nz), np.arange(g.ny), np.arange(g.nx),
                          indexing="ij")
    sigma = (0.4 * np.sin(2 * np.pi * x / g.nx)).astype(np.float32)
    u = np.stack([0.2 * np.cos(2 * np.pi * y / g.ny),
                  np.zeros_like(sigma), np.zeros_like(sigma)]
                 ).astype(np.float32)
    snap = export.save_fields_npz(str(tmp_path / "tgt"), g,
                                  {"sigma": sigma, "u": u}, t=0.25)
    ckpt = str(tmp_path / "fit.npz")
    rc, out = _run(capsys, [
        "fit", "--target", snap, "--hidden", "16", "--steps", "120",
        "--lr", "3e-3", "--out", ckpt,
    ])
    assert rc == 0
    assert out["loss_last"] < 0.2 * out["loss_first"]
    assert out["snapshots"][0]["psnr_sigma_db"] > 10.0
    assert out["compression_ratio"] > 0
    # the fit checkpoint round-trips through serve
    rc, out = _run(capsys, ["serve", "--ckpt", ckpt,
                            "--out", str(tmp_path / "refit.npz")])
    assert rc == 0


def test_cli_train_ngp_family(capsys, tmp_path):
    ckpt = str(tmp_path / "ngp.npz")
    rc, out = _run(capsys, [
        "train", "--grid", "8x6x6", "--family", "ngp", "--levels", "2",
        "--max-res", "8", "--hidden", "8", "--steps", "5", "--out", ckpt,
    ])
    assert rc == 0 and np.isfinite(out["loss_last"])
    g2, cfg2, _ = modelio.load_model(ckpt)
    assert isinstance(cfg2, NGPFieldConfig)
    assert cfg2.encoding.num_levels == 2
