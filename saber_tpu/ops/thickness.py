"""Presence-curve fitting over the tomogram z-axis.

Reference: saber/filters/estimate_thickness.py — per-mask scipy
``curve_fit`` of a clipped quadratic and a Gaussian to the decoder's
per-frame object-score logits; the better-R² fit gates which z-slices a
3D mask occupies.

TPU-native redesign: the reference loops masks in Python and calls a
CPU Fortran optimizer per mask. Here both model families are fit with a
bounded Levenberg–Marquardt solver written in jnp and ``vmap``-ed over
masks, so a whole slab's presence curves fit in one device launch.
Model functions, initial guesses, bounds, preprocessing, and the R²
model-selection rule match the reference (estimate_thickness.py:7-66).
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def quadratic(x, p):
    """d * max(a(x-b)^2 + c, 0) (reference estimate_thickness.py:7-8)."""
    a, b, c, d = p[0], p[1], p[2], p[3]
    return d * jnp.maximum(a * (x - b) ** 2 + c, 0.0)


def gaussian(x, p):
    """a * exp(-(x-b)^2 / (2 c^2)) (reference estimate_thickness.py:23-25)."""
    a, b, c = p[0], p[1], p[2]
    return a * jnp.exp(-((x - b) ** 2) / (2.0 * c**2 + 1e-12))


def _lm_fit(model, x, y, p0, lower, upper, iters: int = 50):
    """Bounded Levenberg–Marquardt via projected steps.

    Jacobian by ``jax.jacfwd`` (tiny parameter counts), normal equations
    solved densely; parameters clipped to the reference's bounds after
    every accepted step. Fixed iteration count keeps the loop jittable.
    """
    resid_fn = lambda p: model(x, p) - y
    jac_fn = jax.jacfwd(resid_fn)

    def cost(p):
        r = resid_fn(p)
        return jnp.sum(r * r)

    def step(state, _):
        p, lam = state
        r = resid_fn(p)
        J = jac_fn(p)  # (N, P)
        JTJ = J.T @ J
        JTr = J.T @ r
        A = JTJ + lam * jnp.diag(jnp.diagonal(JTJ) + 1e-10)
        delta = jnp.linalg.solve(A + 1e-10 * jnp.eye(A.shape[0]), JTr)
        p_new = jnp.clip(p - delta, lower, upper)
        improved = cost(p_new) < cost(p)
        p = jnp.where(improved, p_new, p)
        lam = jnp.where(improved, lam * 0.5, lam * 2.0)
        lam = jnp.clip(lam, 1e-8, 1e8)
        return (p, lam), None

    p0 = jnp.clip(p0, lower, upper)
    (p, _), _ = jax.lax.scan(step, (p0, jnp.float32(1e-3)), None, length=iters)
    return p


def _r2(y, y_fit):
    ss_res = jnp.sum((y - y_fit) ** 2)
    ss_tot = jnp.sum((y - jnp.mean(y)) ** 2)
    return jnp.where(ss_tot == 0, 0.0, 1.0 - ss_res / ss_tot)


def _preprocess(data):
    """max(·,0) → subtract mean of frames [-15,-5) → max(·,0)
    (reference estimate_thickness.py:55-66)."""
    data = jnp.maximum(data, 0.0)
    data = data - jnp.mean(data[-15:-5])
    return jnp.maximum(data, 0.0)


@partial(jax.jit, static_argnames=())
def _fit_single(scores: jnp.ndarray) -> jnp.ndarray:
    """Fit one mask's presence curve; returns the gated curve over z."""
    n = scores.shape[0]
    data = _preprocess(scores)
    x = jnp.arange(n, dtype=jnp.float32)
    x_max = jnp.argmax(data[1:-1]).astype(jnp.float32)
    dmax = jnp.max(data)

    # Quadratic: p0=[-1e-3, argmax, 1, max/2]; bounds per reference :13-17.
    pq = _lm_fit(
        quadratic, x, data,
        jnp.array([-1e-3, x_max, 1.0, dmax / 2.0]),
        jnp.array([-jnp.inf, 0.0, 0.0, 0.0]),
        jnp.array([0.0, float(n), 10.0, 10.0]),
    )
    yq = quadratic(x, pq)
    r2q = _r2(data, yq)

    # Gaussian: p0=[max, argmax, 0.3]; c bounded by n*0.25/2.355 (:27-39).
    c_max = n * 0.25 / 2.355
    pg = _lm_fit(
        gaussian, x, data,
        jnp.array([dmax, x_max, 3e-1]),
        jnp.array([0.0, 0.0, 1e-6]),
        jnp.array([jnp.inf, float(n), c_max]),
    )
    yg = gaussian(x, pg)
    r2g = _r2(data, yg)

    both_bad = jnp.logical_and(r2q <= 0, r2g <= 0)
    curve = jnp.where(r2q > r2g, yq, yg)
    return jnp.where(both_bad, jnp.zeros_like(curve), curve)


_fit_batch = jax.jit(jax.vmap(_fit_single, in_axes=1, out_axes=1))


def fit_organelle_boundaries(frame_scores: np.ndarray, plot: bool = False) -> np.ndarray:
    """Fit per-mask z presence curves (reference estimate_thickness.py:68-112).

    Args:
        frame_scores: (nFrames, nMasks) object-score logits per z-slice.
    Returns:
        (nFrames, nMasks) fitted presence curves (0 where no fit succeeded).
    """
    frame_scores = np.asarray(frame_scores, np.float32)
    if frame_scores.ndim != 2:
        raise ValueError(
            f"expected (nFrames, nMasks), got {frame_scores.shape}")
    if frame_scores.shape[1] == 0:
        return np.zeros_like(frame_scores)
    # the fit is tiny ((Z, n_obj) inputs) — pin it to the local CPU
    # backend so it never costs a remote-accelerator program load
    try:
        cpu = jax.devices("cpu")[0]
    except RuntimeError:
        cpu = None
    if cpu is not None:
        with jax.default_device(cpu):
            return np.asarray(_fit_batch(jnp.asarray(frame_scores)))
    return np.asarray(_fit_batch(jnp.asarray(frame_scores)))
