"""Padded, statically-shaped Gaussian parameter store.

The reference grows/shrinks torch tensors every refinement step and performs
optimizer-state surgery to match (reference dn_splatter/dn_model.py:149-170,
1120-1152). On TPU that would recompile at every step; here the store is a
fixed-capacity pytree with an `alive` mask:

- densify/cull/touch-insert are masked writes into free slots (no reshapes),
- the Adam moments live in identically-shaped arrays and are permuted/zeroed
  by the same slot operations,
- `jit` compiles the train step exactly once per capacity bucket.

Param groups mirror the reference's seven per-Gaussian params
(dn_model.py:294-304): means, quats, scales (log), opacities (logit),
features_dc, features_rest, normals.
"""
from __future__ import annotations


import chex
import jax
import jax.numpy as jnp

from fusionsense_tpu.core.sh import num_sh_bases

PARAM_KEYS = (
    "means", "quats", "log_scales", "logit_opacities",
    "features_dc", "features_rest", "normals",
)


@chex.dataclass
class GaussianState:
    """All fields share leading dim = capacity (static)."""

    means: jax.Array            # (C, 3)
    quats: jax.Array            # (C, 4) wxyz, unnormalized
    log_scales: jax.Array       # (C, 3)
    logit_opacities: jax.Array  # (C,)
    features_dc: jax.Array      # (C, 3) SH degree-0
    features_rest: jax.Array    # (C, K-1, 3) higher SH bands
    normals: jax.Array          # (C, 3) explicit normals (touch targets)
    alive: jax.Array            # (C,) bool
    frozen: jax.Array           # (C,) bool — touch-anchored, excluded from
    #                              ADC and gradient updates on geometry

    @property
    def capacity(self) -> int:
        return self.means.shape[0]

    @property
    def num_alive(self) -> jax.Array:
        return jnp.sum(self.alive)

    def params(self) -> dict:
        return {k: getattr(self, k) for k in PARAM_KEYS}

    def replace_params(self, p: dict) -> "GaussianState":
        return self.replace(**p)  # type: ignore[attr-defined]


def new_state(capacity: int, sh_degree: int = 3) -> GaussianState:
    K = num_sh_bases(sh_degree)
    f32 = jnp.float32  # explicit dtypes: weak-typed arrays (jnp.full with a
    # python float) would flip to strong after the first jitted step and
    # force a full recompile of the training chunk
    return GaussianState(
        means=jnp.zeros((capacity, 3), f32),
        quats=jnp.zeros((capacity, 4), f32).at[:, 0].set(1.0),
        log_scales=jnp.full((capacity, 3), -5.0, f32),
        logit_opacities=jnp.full((capacity,), -10.0, f32),
        features_dc=jnp.zeros((capacity, 3), f32),
        features_rest=jnp.zeros((capacity, K - 1, 3), f32),
        normals=jnp.zeros((capacity, 3), f32).at[:, 2].set(1.0),
        alive=jnp.zeros((capacity,), bool),
        frozen=jnp.zeros((capacity,), bool),
    )


def binary_opacity_surgery(logit_opacities, step, *, threshold: float,
                           warmup: int, skip: int, margin: int = 200):
    """The reference's binary opacities, faithfully: per-step PARAM
    SURGERY in LOGIT space (dn_model.py:492-503 writes
    ``opacities.data = where(opacities >= 0.9, 1, 0)`` — the raw logits,
    not the sigmoids, so splats collapse to sigmoid(0)=0.5 /
    sigmoid(1)=0.731, never to invisible). Active only after `warmup`
    and skipped at each opacity-reset step and for `margin` steps after
    (``skip = reset_alpha_every * refine_every``) so resets can take
    effect and opacities re-learn before being re-binarized.

    Returns the (possibly) snapped logits; apply to the stored params at
    the top of each training step — the optimizer then updates from the
    snapped point exactly as the reference's Adam does after `.data`
    surgery.

    Phase anchoring: the reference's resets land at
    ``step % skip == refine_every`` inside its margin window; OUR resets
    fire at ``step == warmup (mod skip)`` (adc.refine), so the margin
    window is anchored there — same semantics (no snapping at a reset or
    for `margin` steps after), different zero point.
    """
    ph = (step - warmup) % skip
    do = (step > warmup) & (ph > margin)
    snapped = jnp.where(logit_opacities >= threshold, 1.0, 0.0)
    return jnp.where(do, snapped, logit_opacities)


def activated(state: GaussianState):
    """Activated (rasterizer-ready) values.

    Dead slots get opacity 0 so they never contribute even if binned.
    Binary opacities need no handling here: the reference implements them
    as logit-space param surgery (see binary_opacity_surgery), so by
    render time the stored logits already carry the binarized values and
    the forward is a plain sigmoid — in training, eval, and export alike.
    """
    op = jax.nn.sigmoid(state.logit_opacities)
    op = jnp.where(state.alive, op, 0.0)
    scales = jnp.exp(state.log_scales)
    # frozen (touch-anchored) Gaussians contribute with detached geometry
    # (reference dn_model.py:534-541)
    det = lambda x: jnp.where(
        state.frozen[:, None] if x.ndim == 2 else state.frozen[:, None, None],
        jax.lax.stop_gradient(x), x)
    means = det(state.means)
    scales = det(scales)
    op = jnp.where(state.frozen, jax.lax.stop_gradient(op), op)
    colors = jnp.concatenate(
        [state.features_dc[:, None, :], state.features_rest], axis=1
    )  # (C, K, 3)
    return means, state.quats, scales, op, colors
