"""Detection ops: XLA-native equivalents of GLIP's maskrcnn_benchmark._C.

The reference compiles ~3.6k LoC of CUDA for its grounded detector
(reference PartSlip/GLIP/maskrcnn_benchmark/csrc/: nms.cu, ml_nms.cu,
soft_nms.cpp, ROIAlign_cuda.cu, SigmoidFocalLoss_cuda.cu — see SURVEY.md
§2.9). These are the TPU-native replacements, written as shape-static
jittable functions so an open-vocab detector port can run end-to-end on
TPU:

- nms / ml_nms: iterative argmax + IoU suppression under lax.fori_loop
  (fixed max_out, mask-padded output — no dynamic shapes),
- soft_nms: linear/gaussian score decay,
- roi_align: bilinear grid sampling per box (pure gather math),
- sigmoid_focal_loss.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def box_iou(a: jax.Array, b: jax.Array) -> jax.Array:
    """(N, 4) x (M, 4) [x0 y0 x1 y1] -> (N, M) IoU."""
    area_a = jnp.maximum(a[:, 2] - a[:, 0], 0) * jnp.maximum(a[:, 3] - a[:, 1], 0)
    area_b = jnp.maximum(b[:, 2] - b[:, 0], 0) * jnp.maximum(b[:, 3] - b[:, 1], 0)
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.maximum(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    union = area_a[:, None] + area_b[None, :] - inter
    return inter / jnp.maximum(union, 1e-9)


@functools.partial(jax.jit, static_argnames=("max_out",))
def nms(boxes: jax.Array, scores: jax.Array, iou_threshold: float = 0.5,
        max_out: int = 100):
    """Greedy NMS. Returns (keep_idx (max_out,), valid (max_out,))."""
    n = boxes.shape[0]
    iou = box_iou(boxes, boxes)

    def body(i, state):
        alive_scores, keep, valid = state
        best = jnp.argmax(alive_scores)
        ok = alive_scores[best] > -jnp.inf
        keep = keep.at[i].set(jnp.where(ok, best, -1))
        valid = valid.at[i].set(ok)
        # suppress overlapping + the chosen box itself
        suppress = (iou[best] > iou_threshold) | (
            jnp.arange(n) == best)
        alive_scores = jnp.where(ok & suppress, -jnp.inf, alive_scores)
        return alive_scores, keep, valid

    keep0 = jnp.full((max_out,), -1, jnp.int32)
    valid0 = jnp.zeros((max_out,), bool)
    _, keep, valid = jax.lax.fori_loop(
        0, min(max_out, n), body, (scores.astype(jnp.float32), keep0, valid0))
    return keep, valid


@functools.partial(jax.jit, static_argnames=("max_out",))
def ml_nms(boxes: jax.Array, scores: jax.Array, labels: jax.Array,
           iou_threshold: float = 0.5, max_out: int = 100):
    """Multi-label NMS: suppression only within the same class — boxes are
    offset per class so cross-class IoU is 0 (the standard trick;
    reference ml_nms.cu)."""
    extent = jnp.max(boxes) - jnp.min(boxes) + 1.0
    off = labels.astype(jnp.float32)[:, None] * extent
    return nms(boxes + off * jnp.array([[1.0, 1.0, 1.0, 1.0]]), scores,
               iou_threshold, max_out)


@functools.partial(jax.jit, static_argnames=("method",))
def soft_nms(boxes: jax.Array, scores: jax.Array, sigma: float = 0.5,
             iou_threshold: float = 0.3, score_threshold: float = 1e-3,
             method: str = "gaussian"):
    """Soft-NMS (reference cpu/soft_nms.cpp): decay instead of suppression.
    Returns rescored scores (same order)."""
    n = boxes.shape[0]
    iou = box_iou(boxes, boxes)

    def body(i, state):
        cur_scores, processed = state
        masked = jnp.where(processed, -jnp.inf, cur_scores)
        best = jnp.argmax(masked)
        ok = masked[best] > score_threshold
        ious = iou[best]
        if method == "gaussian":
            decay = jnp.exp(-(ious ** 2) / sigma)
        else:
            decay = jnp.where(ious > iou_threshold, 1.0 - ious, 1.0)
        decay = jnp.where(processed | (jnp.arange(n) == best), 1.0, decay)
        cur_scores = jnp.where(ok, cur_scores * decay, cur_scores)
        processed = processed.at[best].set(True)
        return cur_scores, processed

    out, _ = jax.lax.fori_loop(0, n, body,
                               (scores.astype(jnp.float32),
                                jnp.zeros((n,), bool)))
    return out


@functools.partial(jax.jit, static_argnames=("output_size", "sampling_ratio"))
def roi_align(features: jax.Array, boxes: jax.Array,
              output_size: int = 7, spatial_scale: float = 1.0,
              sampling_ratio: int = 2):
    """ROIAlign (reference ROIAlign_cuda.cu): bilinear-sampled pooled crops.

    features: (H, W, C); boxes (N, 4) in input coords. Returns
    (N, output_size, output_size, C)."""
    H, W, C = features.shape
    b = boxes * spatial_scale
    n = boxes.shape[0]
    S = output_size * sampling_ratio

    # sample grid per box: S x S bilinear taps, avg-pooled to output_size^2
    ys = (jnp.arange(S) + 0.5) / S
    xs = (jnp.arange(S) + 0.5) / S
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")

    def one_box(box):
        x0, y0, x1, y1 = box
        px = x0 + gx * jnp.maximum(x1 - x0, 1.0)
        py = y0 + gy * jnp.maximum(y1 - y0, 1.0)
        x0i = jnp.clip(jnp.floor(px - 0.5).astype(jnp.int32), 0, W - 1)
        y0i = jnp.clip(jnp.floor(py - 0.5).astype(jnp.int32), 0, H - 1)
        x1i = jnp.clip(x0i + 1, 0, W - 1)
        y1i = jnp.clip(y0i + 1, 0, H - 1)
        fx = jnp.clip(px - 0.5 - x0i, 0.0, 1.0)[..., None]
        fy = jnp.clip(py - 0.5 - y0i, 0.0, 1.0)[..., None]
        v = (features[y0i, x0i] * (1 - fx) * (1 - fy)
             + features[y0i, x1i] * fx * (1 - fy)
             + features[y1i, x0i] * (1 - fx) * fy
             + features[y1i, x1i] * fx * fy)          # (S, S, C)
        v = v.reshape(output_size, sampling_ratio,
                      output_size, sampling_ratio, C)
        return v.mean(axis=(1, 3))

    return jax.vmap(one_box)(b)


@jax.jit
def sigmoid_focal_loss(logits: jax.Array, targets: jax.Array,
                       alpha: float = 0.25, gamma: float = 2.0) -> jax.Array:
    """Per-element focal loss (reference SigmoidFocalLoss_cuda.cu)."""
    p = jax.nn.sigmoid(logits)
    ce = jnp.maximum(logits, 0) - logits * targets + jnp.log1p(
        jnp.exp(-jnp.abs(logits)))
    p_t = p * targets + (1 - p) * (1 - targets)
    a_t = alpha * targets + (1 - alpha) * (1 - targets)
    return a_t * ((1 - p_t) ** gamma) * ce


# ----------------------------------------------------- deformable ops ------

def _bilinear_sample(img: jax.Array, py: jax.Array, px: jax.Array) -> jax.Array:
    """Sample (H, W, C) at float coords (zeros outside), coords (...,)."""
    H, W, _ = img.shape
    y0 = jnp.floor(py)
    x0 = jnp.floor(px)
    fy = (py - y0)[..., None]
    fx = (px - x0)[..., None]
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)

    def tap(yi, xi):
        inside = ((yi >= 0) & (yi < H) & (xi >= 0) & (xi < W))[..., None]
        v = img[jnp.clip(yi, 0, H - 1), jnp.clip(xi, 0, W - 1)]
        return jnp.where(inside, v, 0.0)

    return (tap(y0i, x0i) * (1 - fy) * (1 - fx)
            + tap(y0i, x0i + 1) * (1 - fy) * fx
            + tap(y0i + 1, x0i) * fy * (1 - fx)
            + tap(y0i + 1, x0i + 1) * fy * fx)


@functools.partial(jax.jit, static_argnames=("stride", "padding", "dilation",
                                             "deformable_groups"))
def deform_conv2d(x: jax.Array, offset: jax.Array, weight: jax.Array,
                  bias: jax.Array | None = None, mask: jax.Array | None = None,
                  stride: int = 1, padding: int = 1, dilation: int = 1,
                  deformable_groups: int = 1) -> jax.Array:
    """Deformable convolution v1/v2 (reference deform_conv_cuda.cu:694 and
    the modulated variant): gather-based bilinear sampling + one matmul,
    the TPU-native shape of the op (MXU does the contraction; no im2col
    scratch in HBM beyond the sampled taps).

    x: (H, W, Cin) input feature map.
    offset: (Ho, Wo, dg*kh*kw*2) sample offsets, (dy, dx) interleaved in the
        torch channel order (y first).
    weight: (kh, kw, Cin, Cout).
    mask: optional (Ho, Wo, dg*kh*kw) modulation (v2); None -> v1.
    Returns (Ho, Wo, Cout).
    """
    H, W, Cin = x.shape
    kh, kw, _, Cout = weight.shape
    K = kh * kw
    Ho = (H + 2 * padding - dilation * (kh - 1) - 1) // stride + 1
    Wo = (W + 2 * padding - dilation * (kw - 1) - 1) // stride + 1
    dg = deformable_groups
    cpg = Cin // dg

    oy = jnp.arange(Ho) * stride - padding
    ox = jnp.arange(Wo) * stride - padding
    kyy, kxx = jnp.meshgrid(jnp.arange(kh) * dilation,
                            jnp.arange(kw) * dilation, indexing="ij")
    # base sample positions, tap-major like the torch kernel: (Ho|1, Wo|1, K)
    base_y = oy[:, None, None] + kyy.reshape(K)[None, None, :]
    base_x = ox[None, :, None] + kxx.reshape(K)[None, None, :]

    off = offset.reshape(Ho, Wo, dg, K, 2)
    taps = []
    for g in range(dg):
        py = base_y + off[:, :, g, :, 0]
        px = base_x + off[:, :, g, :, 1]
        sg = _bilinear_sample(x[:, :, g * cpg:(g + 1) * cpg],
                              py, px)                     # (Ho, Wo, K, cpg)
        if mask is not None:
            sg = sg * mask.reshape(Ho, Wo, dg, K)[:, :, g, :, None]
        taps.append(sg)
    sampled = jnp.concatenate(taps, axis=-1) if dg > 1 else taps[0]
    # (Ho, Wo, K, Cin) x (K, Cin, Cout) -> (Ho, Wo, Cout) on the MXU
    out = jnp.einsum("hwkc,kco->hwo", sampled, weight.reshape(K, Cin, Cout))
    if bias is not None:
        out = out + bias
    return out


@functools.partial(jax.jit, static_argnames=("output_size",))
def roi_pool(features: jax.Array, boxes: jax.Array, output_size: int = 7,
             spatial_scale: float = 1.0):
    """ROIPool (reference ROIPool_cuda.cu:212): max-pool over quantized
    bins. features (H, W, C); boxes (N, 4). Returns (N, out, out, C)."""
    H, W, C = features.shape
    b = jnp.round(boxes * spatial_scale)

    def one_box(box):
        x0, y0, x1, y1 = box
        rw = jnp.maximum(x1 - x0 + 1.0, 1.0)
        rh = jnp.maximum(y1 - y0 + 1.0, 1.0)
        # bin edges, quantized exactly like the CUDA kernel
        iy = jnp.arange(output_size)
        ix = jnp.arange(output_size)
        ys = jnp.clip(jnp.floor(y0 + iy * rh / output_size), 0, H - 1
                      ).astype(jnp.int32)
        ye = jnp.clip(jnp.ceil(y0 + (iy + 1) * rh / output_size), 0, H
                      ).astype(jnp.int32)
        xs = jnp.clip(jnp.floor(x0 + ix * rw / output_size), 0, W - 1
                      ).astype(jnp.int32)
        xe = jnp.clip(jnp.ceil(x0 + (ix + 1) * rw / output_size), 0, W
                      ).astype(jnp.int32)
        # static-shape max over the full map with a per-bin membership mask
        gy = jnp.arange(H)[None, :]
        gx = jnp.arange(W)[None, :]
        my = (gy >= ys[:, None]) & (gy < ye[:, None])       # (out, H)
        mx = (gx >= xs[:, None]) & (gx < xe[:, None])       # (out, W)
        m = my[:, None, :, None] & mx[None, :, None, :]     # (out, out, H, W)
        vals = jnp.where(m[..., None], features[None, None], -jnp.inf)
        out = jnp.max(vals, axis=(2, 3))
        return jnp.where(jnp.isfinite(out), out, 0.0)

    return jax.vmap(one_box)(b)


@functools.partial(jax.jit, static_argnames=("output_size", "sampling_ratio"))
def deform_roi_pool(features: jax.Array, boxes: jax.Array, offsets: jax.Array,
                    output_size: int = 7, spatial_scale: float = 1.0,
                    sampling_ratio: int = 2, gamma: float = 0.1):
    """Deformable ROI pooling (reference deform_pool_cuda.cu:456): ROIAlign
    bins shifted by learned normalized offsets (gamma-scaled by box size).

    offsets: (N, output_size, output_size, 2) normalized (dy, dx)."""
    H, W, C = features.shape
    b = boxes * spatial_scale
    S = sampling_ratio

    def one_box(box, off):
        x0, y0, x1, y1 = box
        rw = jnp.maximum(x1 - x0, 1.0)
        rh = jnp.maximum(y1 - y0, 1.0)
        bw, bh = rw / output_size, rh / output_size
        iy = jnp.arange(output_size)
        s = (jnp.arange(S) + 0.5) / S
        # per-bin sample grid + deform shift
        by = y0 + iy[:, None, None, None] * bh + s[None, None, :, None] * bh
        bx = x0 + iy[None, :, None, None] * bw + s[None, None, None, :] * bw
        by = by + (off[..., 0] * gamma * rh)[:, :, None, None]
        bx = bx + (off[..., 1] * gamma * rw)[:, :, None, None]
        py = jnp.broadcast_to(by, (output_size, output_size, S, S))
        px = jnp.broadcast_to(bx, (output_size, output_size, S, S))
        v = _bilinear_sample(features, py, px)
        return v.mean(axis=(2, 3))

    return jax.vmap(one_box)(b, offsets)
