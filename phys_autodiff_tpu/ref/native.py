"""ctypes bindings for the native C++ oracle (csrc/physd_oracle.cpp).

The compiled arm of the ground truth: independent of both NumPy and JAX,
double internals, playing the role of the reference's C++ CPU implementation
(SURVEY.md §2 #6). Built on demand with g++ into build/ and cached; loading
is lazy so environments without a toolchain can still use the NumPy oracle.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

from phys_autodiff_tpu.utils.config import GridSpec, PhysWeights

_REPO_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
_SRC = os.path.join(_REPO_ROOT, "csrc", "physd_oracle.cpp")
_BUILD_DIR = os.path.join(_REPO_ROOT, "build")
_LIB = os.path.join(_BUILD_DIR, "libphysd_oracle.so")

_lib = None


def build(force: bool = False) -> str:
    """Compile the shared library if needed; returns its path. A prebuilt
    .so is usable even when csrc/ is absent (deployments that ship only
    build/)."""
    os.makedirs(_BUILD_DIR, exist_ok=True)
    have_src = os.path.exists(_SRC)
    stale = (
        force
        or not os.path.exists(_LIB)
        or (have_src and os.path.getmtime(_LIB) < os.path.getmtime(_SRC))
    )
    if stale:
        if not have_src:
            raise FileNotFoundError(
                f"native oracle source {_SRC} is missing and no usable "
                f"prebuilt library exists at {_LIB}"
            )
        subprocess.run(
            ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", _SRC, "-o", _LIB],
            check=True,
            capture_output=True,
        )
    return _LIB


def _load():
    global _lib
    if _lib is not None:
        return _lib
    lib = ctypes.CDLL(build())
    f32p = ctypes.POINTER(ctypes.c_float)
    i64p = ctypes.POINTER(ctypes.c_int64)
    lib.physd_residuals.argtypes = [i64p, f32p, ctypes.c_int] + [f32p] * 8
    lib.physd_residuals_ex.argtypes = (
        [i64p, f32p, ctypes.c_int, ctypes.c_int] + [f32p] * 8
    )
    lib.physd_loss_forward.argtypes = [i64p, f32p, ctypes.c_int, f32p] + [f32p] * 9
    lib.physd_loss_forward_ex.argtypes = (
        [i64p, f32p, ctypes.c_int, ctypes.c_int, f32p] + [f32p] * 9
    )
    lib.physd_loss_backward.argtypes = [i64p, f32p] + [f32p] * 4
    lib.physd_mlp_forward.argtypes = [f32p] * 6 + [ctypes.c_int64] * 4
    _lib = lib
    return lib


def _f32(a):
    return np.ascontiguousarray(a, dtype=np.float32)


def _ptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _grid_args(g: GridSpec):
    dims = np.asarray([g.nx, g.ny, g.nz], dtype=np.int64)
    spacing = np.asarray([g.hx, g.hy, g.hz, g.dt], dtype=np.float32)
    return dims, spacing


def available() -> bool:
    try:
        _load()
        return True
    except (OSError, subprocess.CalledProcessError, FileNotFoundError):
        return False


def residuals(g: GridSpec, sigma_tm1, sigma_t, sigma_tp1, u_tm1, u_t, u_tp1):
    lib = _load()
    dims, spacing = _grid_args(g)
    args = [_f32(x) for x in (sigma_tm1, sigma_t, sigma_tp1, u_tm1, u_t, u_tp1)]
    r_sigma = np.empty(g.shape, dtype=np.float32)
    r_u = np.empty((3,) + g.shape, dtype=np.float32)
    lib.physd_residuals_ex(
        dims.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        _ptr(spacing),
        int(g.periodic),
        int(g.scheme == "upwind"),
        *[_ptr(a) for a in args],
        _ptr(r_sigma),
        _ptr(r_u),
    )
    return r_sigma, r_u


def loss_forward(
    g: GridSpec, w: PhysWeights, sigma_tm1, sigma_t, sigma_tp1, u_tm1, u_t, u_tp1
):
    lib = _load()
    dims, spacing = _grid_args(g)
    wts = np.asarray([w.w_sigma, w.w_u], dtype=np.float32)
    args = [_f32(x) for x in (sigma_tm1, sigma_t, sigma_tp1, u_tm1, u_t, u_tp1)]
    out = np.zeros(2, dtype=np.float32)
    lib.physd_loss_forward_ex(
        dims.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        _ptr(spacing),
        int(g.periodic),
        int(g.scheme == "upwind"),
        _ptr(wts),
        *[_ptr(a) for a in args],
        _ptr(out),
        None,
        None,
    )
    return np.float32(out[0]), np.float32(out[1])


def loss_backward(g: GridSpec, w: PhysWeights, r_sigma, r_u):
    lib = _load()
    dims, _ = _grid_args(g)
    wts = np.asarray([w.w_sigma, w.w_u], dtype=np.float32)
    rs, ru = _f32(r_sigma), _f32(r_u)
    g_sigma = np.empty_like(rs)
    g_u = np.empty_like(ru)
    lib.physd_loss_backward(
        dims.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        _ptr(wts),
        _ptr(rs),
        _ptr(ru),
        _ptr(g_sigma),
        _ptr(g_u),
    )
    return g_sigma, g_u


def mlp_forward(params: dict, x) -> np.ndarray:
    """Framework-layout MLP forward: W1 [In,H], W2 [H,Out]."""
    lib = _load()
    w1 = _f32(params["W1"])
    b1 = _f32(params["b1"])
    w2 = _f32(params["W2"])
    b2 = _f32(params["b2"])
    x = _f32(x)
    batch, in_dim = x.shape
    hidden = w1.shape[1]
    out_dim = w2.shape[1]
    y = np.empty((batch, out_dim), dtype=np.float32)
    lib.physd_mlp_forward(
        _ptr(x), _ptr(w1), _ptr(b1), _ptr(w2), _ptr(b2), _ptr(y),
        batch, in_dim, hidden, out_dim,
    )
    return y
