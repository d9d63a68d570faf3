"""NumPy reference MLP — the oracle arm for the MLP parity tests.

Mirrors the reference CPU MLP semantics (src/mlp_cpu.cpp): float32
arithmetic (the reference CPU MLP is float, unlike the physics CPU path
which is double inside), y = W2.relu(W1.x + b1) + b2, and the hand-derived
MSE-head gradients (src/mlp_cpu.cpp:38-85).

Takes weights in the reference row-major layout: W1 [H, In], W2 [Out, H]
(src/mlp_cpu.cpp:15). Use models.mlp.to_reference_layout to convert.
"""

from __future__ import annotations

import numpy as np


def forward(ref_params: dict, x: np.ndarray) -> np.ndarray:
    """x: [B, In] -> y: [B, Out], float32."""
    w1 = np.asarray(ref_params["W1"], dtype=np.float32)  # [H, In]
    b1 = np.asarray(ref_params["b1"], dtype=np.float32)
    w2 = np.asarray(ref_params["W2"], dtype=np.float32)  # [Out, H]
    b2 = np.asarray(ref_params["b2"], dtype=np.float32)
    x = np.asarray(x, dtype=np.float32)
    z1 = x @ w1.T + b1
    a1 = np.maximum(z1, 0.0, dtype=np.float32)
    return (a1 @ w2.T + b2).astype(np.float32)


def mse_backward(ref_params: dict, x: np.ndarray, y_target: np.ndarray) -> dict:
    """Hand-derived gradients of L = mean((y - y_t)^2) over B*Out
    (src/mlp_cpu.cpp:56-85). Returns reference-layout grads."""
    w1 = np.asarray(ref_params["W1"], dtype=np.float32)
    b1 = np.asarray(ref_params["b1"], dtype=np.float32)
    w2 = np.asarray(ref_params["W2"], dtype=np.float32)
    b2 = np.asarray(ref_params["b2"], dtype=np.float32)
    x = np.asarray(x, dtype=np.float32)
    y_target = np.asarray(y_target, dtype=np.float32)
    b, out = y_target.shape

    z1 = x @ w1.T + b1
    a1 = np.maximum(z1, 0.0, dtype=np.float32)
    y = a1 @ w2.T + b2

    gz2 = (np.float32(2.0) / np.float32(b * out)) * (y - y_target)  # [B, Out]
    dw2 = gz2.T @ a1  # [Out, H]
    db2 = gz2.sum(axis=0)
    gz1 = (gz2 @ w2) * (z1 > 0.0).astype(np.float32)  # [B, H]
    dw1 = gz1.T @ x  # [H, In]
    db1 = gz1.sum(axis=0)
    return {
        "W1": dw1.astype(np.float32),
        "b1": db1.astype(np.float32),
        "W2": dw2.astype(np.float32),
        "b2": db2.astype(np.float32),
    }
