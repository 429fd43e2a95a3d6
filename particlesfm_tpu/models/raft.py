"""RAFT-class recurrent optical flow network in Flax (TPU-native).

Native reimplementation of the flow component the reference delegates to its
PyTorch RAFT fork (consumed via compute_raft_custom_folder at
/root/reference/run_particlesfm.py:31-36; architecture per Teed & Deng,
ECCV 2020, standard "raft-things" configuration so released checkpoints can be
imported with `load_torch_checkpoint`).

TPU-first choices:
  - NHWC layout throughout; convs lower to MXU-tiled XLA convolutions;
  - the all-pairs correlation volume is one [H8*W8, D] x [D, H8*W8] matmul
    (pure MXU work) with a 4-level average-pooled pyramid;
  - the windowed correlation lookup is a batched bilinear gather expressed with
    static shapes so XLA fuses it with the surrounding elementwise work;
  - iteration loop runs under lax.scan (single compiled update step);
  - pairs batch data-parallel over the device mesh (frames axis).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn


def _instance_norm(x):
    mean = jnp.mean(x, axis=(-3, -2), keepdims=True)
    var = jnp.var(x, axis=(-3, -2), keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + 1e-5)


class ResidualBlock(nn.Module):
    planes: int
    stride: int = 1
    norm: str = "instance"   # instance | batch | none

    def _norm(self, name):
        if self.norm == "batch":
            return nn.BatchNorm(use_running_average=True, momentum=0.9, epsilon=1e-5, name=name)
        if self.norm == "instance":
            return lambda x: _instance_norm(x)
        return lambda x: x

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(self.planes, (3, 3), strides=self.stride, padding=1, name="conv1")(x)
        y = self._norm("norm1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.planes, (3, 3), padding=1, name="conv2")(y)
        y = self._norm("norm2")(y)
        y = nn.relu(y)
        if self.stride != 1 or x.shape[-1] != self.planes:
            x = nn.Conv(self.planes, (1, 1), strides=self.stride, name="downsample")(x)
            x = self._norm("norm3")(x)
        return nn.relu(x + y)


class BasicEncoder(nn.Module):
    output_dim: int = 256
    norm: str = "instance"
    base: int = 64          # layer widths (base, 3*base/2, 2*base); 64 = raft-things

    @nn.compact
    def __call__(self, x):
        b = self.base
        x = nn.Conv(b, (7, 7), strides=2, padding=3, name="conv1")(x)
        if self.norm == "batch":
            x = nn.BatchNorm(use_running_average=True, name="norm1")(x)
        elif self.norm == "instance":
            x = _instance_norm(x)
        x = nn.relu(x)
        for i, (planes, stride) in enumerate(((b, 1), (3 * b // 2, 2), (2 * b, 2))):
            x = ResidualBlock(planes, stride, self.norm, name=f"layer{i+1}_0")(x)
            x = ResidualBlock(planes, 1, self.norm, name=f"layer{i+1}_1")(x)
        return nn.Conv(self.output_dim, (1, 1), name="conv2")(x)


# ---------------------------------------------------------------------------
# correlation pyramid
# ---------------------------------------------------------------------------

def build_corr_pyramid(fmap1: jnp.ndarray, fmap2: jnp.ndarray, num_levels: int = 4):
    """All-pairs correlation + pooled pyramid.

    fmap1, fmap2: [H, W, D] (1/8 resolution). Returns list of [H*W, Hl, Wl, 1].
    The volume is one matmul on the MXU; pyramid levels average-pool the target
    dimensions.
    """
    H, W, D = fmap1.shape
    f1 = fmap1.reshape(H * W, D)
    f2 = fmap2.reshape(H * W, D)
    corr = jnp.dot(f1, f2.T, preferred_element_type=jnp.float32)
    corr = corr / jnp.sqrt(jnp.asarray(D, corr.dtype))
    corr = corr.reshape(H * W, H, W, 1)
    pyramid = [corr]
    for _ in range(num_levels - 1):
        corr = nn.avg_pool(corr, (2, 2), strides=(2, 2))
        pyramid.append(corr)
    return pyramid


def lookup_corr_gather(pyramid, coords: jnp.ndarray, radius: int = 4) -> jnp.ndarray:
    """Reference lookup via per-corner scalar gathers (kept for equivalence
    tests; see lookup_corr for why it is not the production path)."""
    H, W, _ = coords.shape
    r = radius
    dx, dy = jnp.meshgrid(
        jnp.arange(-r, r + 1, dtype=coords.dtype),
        jnp.arange(-r, r + 1, dtype=coords.dtype),
        indexing="xy",
    )
    delta = jnp.stack([dx, dy], axis=-1).reshape(-1, 2)        # [81, 2]
    out = []
    for lvl, corr in enumerate(pyramid):
        centroid = coords.reshape(H * W, 1, 2) / (2.0 ** lvl)  # [HW, 1, 2]
        pts = centroid + delta[None]                           # [HW, 81, 2]
        # per source pixel, bilinear sample its own [Hl, Wl] map
        Hl, Wl = corr.shape[1], corr.shape[2]
        x = pts[..., 0]
        y = pts[..., 1]
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        wx = x - x0
        wy = y - y0
        x0i = x0.astype(jnp.int32)
        y0i = y0.astype(jnp.int32)

        def gather(yi, xi):
            valid = (xi >= 0) & (xi < Wl) & (yi >= 0) & (yi < Hl)
            xi = jnp.clip(xi, 0, Wl - 1)
            yi = jnp.clip(yi, 0, Hl - 1)
            rows = jnp.arange(H * W)[:, None]
            v = corr[rows, yi, xi, 0]
            return v * valid.astype(corr.dtype)

        val = (
            (1 - wx) * (1 - wy) * gather(y0i, x0i)
            + wx * (1 - wy) * gather(y0i, x0i + 1)
            + (1 - wx) * wy * gather(y0i + 1, x0i)
            + wx * wy * gather(y0i + 1, x0i + 1)
        )
        out.append(val)
    return jnp.concatenate(out, axis=-1).reshape(H, W, -1)


def lookup_corr(pyramid, coords: jnp.ndarray, radius: int = 4) -> jnp.ndarray:
    """Sample (2r+1)^2 windows around coords in every pyramid level.

    coords: [H, W, 2] target positions at 1/8 resolution (x, y).
    Returns [H, W, num_levels*(2r+1)^2].

    TPU formulation: the naive per-corner gather (lookup_corr_gather) issues
    4 x 81 x levels SCALAR gathers per source pixel — measured ~90 ms per GRU
    iteration at 1024x440 (the entire flow net ran at 0.7 pairs/s, and this
    was ~90% of it). Instead:

      1. gather each source pixel's (2r+2) FULL ROWS of its own correlation
         map (contiguous lane-aligned vectors — the embedding-lookup pattern
         XLA lowers efficiently), and
      2. apply the bilinear x/y interpolation of all 81 offsets as two tiny
         batched matmuls against per-pixel hat-function weight matrices
         (separable bilinear: val[p,dy,dx] = Yw[p,:,dy]^T rows[p] Xw[p,:,dx]).

    Numerically identical to the gather path (same clamp/validity semantics:
    a hat weight over existing lanes is exactly the original's zeroed
    out-of-bounds corner contributions).
    """
    H, W, _ = coords.shape
    r = radius
    nw = 2 * r + 2                     # rows spanning all dy in [-r, r] + 1
    offs = jnp.arange(-r, r + 1, dtype=coords.dtype)           # [9]
    out = []
    for lvl, corr in enumerate(pyramid):
        HW, Hl, Wl = corr.shape[0], corr.shape[1], corr.shape[2]
        c = coords.reshape(HW, 2) / (2.0 ** lvl)
        cx, cy = c[..., 0], c[..., 1]                          # [HW]
        y0 = jnp.floor(cy).astype(jnp.int32) - r               # [HW]
        ri = y0[:, None] + jnp.arange(nw, dtype=jnp.int32)     # [HW, nw]
        ri_c = jnp.clip(ri, 0, Hl - 1)
        # row gather: [HW*Hl, Wl] indexed by p*Hl + row -> [HW, nw, Wl]
        flat = corr.reshape(HW * Hl, Wl)
        rows = jnp.take(
            flat,
            (jnp.arange(HW, dtype=jnp.int32)[:, None] * Hl + ri_c).reshape(-1),
            axis=0,
        ).reshape(HW, nw, Wl)
        # x hat weights over lanes: [HW, Wl, 9]
        lanes = jnp.arange(Wl, dtype=coords.dtype)
        tx = cx[:, None] + offs[None, :]                       # [HW, 9]
        Xw = jnp.maximum(
            0.0, 1.0 - jnp.abs(lanes[None, :, None] - tx[:, None, :])
        )
        # y hat weights over gathered rows (zero where the UNCLIPPED row index
        # falls outside the map — the gather path's validity mask): [HW, nw, 9]
        ty = cy[:, None] + offs[None, :]                       # [HW, 9]
        yin = ((ri >= 0) & (ri < Hl)).astype(coords.dtype)     # [HW, nw]
        Yw = jnp.maximum(
            0.0, 1.0 - jnp.abs(ri.astype(coords.dtype)[:, :, None] - ty[:, None, :])
        ) * yin[:, :, None]
        # separable bilinear of all 81 offsets as two batched matmuls; f32
        # accumulation (these MACs are tiny — the net's default bf16 matmul
        # precision would quantize the correlation values the gather path
        # reads exactly)
        t1 = jnp.einsum("pnw,pwj->pnj", rows, Xw,
                        precision=jax.lax.Precision.HIGHEST)   # [HW, nw, 9(dx)]
        val = jnp.einsum("pnk,pnj->pkj", Yw, t1,
                         precision=jax.lax.Precision.HIGHEST)  # [HW, 9(dy), 9(dx)]
        out.append(val.reshape(HW, (2 * r + 1) ** 2))
    return jnp.concatenate(out, axis=-1).reshape(H, W, -1)


# ---------------------------------------------------------------------------
# update block
# ---------------------------------------------------------------------------

class BasicMotionEncoder(nn.Module):
    dims: tuple = (256, 192, 128, 64, 128)  # convc1, convc2, convf1, convf2, out

    @nn.compact
    def __call__(self, flow, corr):
        d = self.dims
        c = nn.relu(nn.Conv(d[0], (1, 1), name="convc1")(corr))
        c = nn.relu(nn.Conv(d[1], (3, 3), padding=1, name="convc2")(c))
        f = nn.relu(nn.Conv(d[2], (7, 7), padding=3, name="convf1")(flow))
        f = nn.relu(nn.Conv(d[3], (3, 3), padding=1, name="convf2")(f))
        out = nn.relu(
            nn.Conv(d[4] - 2, (3, 3), padding=1, name="conv")(jnp.concatenate([c, f], -1))
        )
        return jnp.concatenate([out, flow], axis=-1)           # d[4] channels


class SepConvGRU(nn.Module):
    hidden: int = 128

    @nn.compact
    def __call__(self, h, x):
        for tag, ksize, pad in (("1", (1, 5), (0, 2)), ("2", (5, 1), (2, 0))):
            padding = [(pad[0], pad[0]), (pad[1], pad[1])]
            hx = jnp.concatenate([h, x], axis=-1)
            z = nn.sigmoid(nn.Conv(self.hidden, ksize, padding=padding, name=f"convz{tag}")(hx))
            r = nn.sigmoid(nn.Conv(self.hidden, ksize, padding=padding, name=f"convr{tag}")(hx))
            q = nn.tanh(
                nn.Conv(self.hidden, ksize, padding=padding, name=f"convq{tag}")(
                    jnp.concatenate([r * h, x], axis=-1)
                )
            )
            h = (1 - z) * h + z * q
        return h


class FlowHead(nn.Module):
    hidden: int = 256

    @nn.compact
    def __call__(self, h):
        return nn.Conv(2, (3, 3), padding=1, name="conv2")(
            nn.relu(nn.Conv(self.hidden, (3, 3), padding=1, name="conv1")(h))
        )


class _RAFTIteration(nn.Module):
    """Scan body: correlation lookup + one GRU update (motion encoder,
    SepConvGRU, flow head, upsample-mask head — torch RAFT's BasicUpdateBlock;
    parameter paths match the released checkpoints via convert_raft)."""
    radius: int = 4
    use_pallas: bool = False
    hidden_dim: int = 128
    motion_dims: tuple = (256, 192, 128, 64, 128)
    head_hidden: int = 256
    mask_hidden: int = 256

    @nn.compact
    def __call__(self, carry, _, inp, pyramid, coords0):
        net, coords1 = carry
        if self.use_pallas:
            from ..ops.corr_lookup import lookup_corr_pyramid_pallas

            corr = lookup_corr_pyramid_pallas(pyramid, coords1, self.radius)
        else:
            corr = lookup_corr(pyramid, coords1, self.radius)
        flow = coords1 - coords0
        motion = BasicMotionEncoder(self.motion_dims, name="encoder")(flow, corr)
        x = jnp.concatenate([inp, motion], axis=-1)
        net = SepConvGRU(self.hidden_dim, name="gru")(net, x)
        delta = FlowHead(self.head_hidden, name="flow_head")(net)
        mask = nn.Conv(576, (1, 1), name="mask_conv2")(
            nn.relu(nn.Conv(self.mask_hidden, (3, 3), padding=1, name="mask_conv1")(net))
        )
        return (net, coords1 + delta), (0.25 * mask, coords1 + delta)


def upsample_flow_convex(flow, mask):
    """Convex 8x upsampling: per output pixel a softmax combo of 9 coarse
    neighbors (RAFT's learned upsampling). flow: [H, W, 2], mask: [H, W, 576]."""
    H, W, _ = flow.shape
    mask = mask.reshape(H, W, 8, 8, 9)
    mask = jax.nn.softmax(mask, axis=-1)
    flow8 = 8.0 * flow
    pad = jnp.pad(flow8, ((1, 1), (1, 1), (0, 0)))
    # 9 shifted copies [H, W, 9, 2]
    shifts = [pad[dy : dy + H, dx : dx + W] for dy in range(3) for dx in range(3)]
    neigh = jnp.stack(shifts, axis=2)                 # [H, W, 9, 2]
    up = jnp.einsum("hwabn,hwnc->hwabc", mask, neigh)  # [H, W, 8, 8, 2]
    return up.transpose(0, 2, 1, 3, 4).reshape(H * 8, W * 8, 2)


class RAFT(nn.Module):
    """Full RAFT model; call with a pair of images [H, W, 3] in [0, 255].

    The GRU recurrence runs under nn.scan (one compiled iteration body with
    shared parameters); use_pallas routes the correlation lookup through the
    windowed-DMA Pallas kernel (ops/corr_lookup.py) on TPU.

    Defaults are the raft-things configuration (released torch checkpoints
    import via convert_raft). `compact_raft()` builds the small configuration
    trained in-environment on synth renders (flow/train.py).
    """
    num_levels: int = 4
    radius: int = 4
    hidden_dim: int = 128
    context_dim: int = 128
    use_pallas: bool = False
    enc_dim: int = 256
    enc_base: int = 64
    motion_dims: tuple = (256, 192, 128, 64, 128)
    head_hidden: int = 256
    mask_hidden: int = 256
    cnet_norm: str = "batch"   # torch-checkpoint parity; "instance" when training
                               # from scratch (no batch_stats collection needed)
    remat: bool = False        # rematerialize each GRU iteration in the backward
                               # pass (training-time HBM fits the 16G v5e chip)

    @nn.compact
    def __call__(self, image1, image2, iters: int = 20, all_iters: bool = False):
        img1 = 2.0 * (image1 / 255.0) - 1.0
        img2 = 2.0 * (image2 / 255.0) - 1.0
        fnet = BasicEncoder(self.enc_dim, "instance", self.enc_base, name="fnet")
        fmap1 = fnet(img1)
        fmap2 = fnet(img2)
        cnet = BasicEncoder(
            self.hidden_dim + self.context_dim, self.cnet_norm, self.enc_base, name="cnet"
        )(img1)
        net = jnp.tanh(cnet[..., : self.hidden_dim])
        inp = nn.relu(cnet[..., self.hidden_dim :])

        pyramid = tuple(build_corr_pyramid(fmap1, fmap2, self.num_levels))
        H8, W8 = fmap1.shape[0], fmap1.shape[1]
        ys, xs = jnp.meshgrid(
            jnp.arange(H8, dtype=jnp.float32), jnp.arange(W8, dtype=jnp.float32), indexing="ij"
        )
        coords0 = jnp.stack([xs, ys], axis=-1)

        body = nn.remat(_RAFTIteration) if self.remat else _RAFTIteration
        scan = nn.scan(
            body,
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=(0, nn.broadcast, nn.broadcast, nn.broadcast),
            length=iters,
        )
        step = scan(
            self.radius, self.use_pallas, self.hidden_dim, self.motion_dims,
            self.head_hidden, self.mask_hidden, name="update_block",
        )
        (net, coords1), (masks, coords_seq) = step(
            (net, coords0), None, inp, pyramid, coords0
        )
        if all_iters:
            # per-iteration upsampled predictions for the RAFT sequence loss
            return jax.vmap(upsample_flow_convex)(coords_seq - coords0[None], masks)
        return upsample_flow_convex(coords1 - coords0, masks[-1])


def compact_raft(use_pallas: bool = False, remat: bool = False) -> RAFT:
    """The small in-environment-trainable configuration (~1.1M params): same
    architecture family and correlation pyramid coverage as raft-things, half
    the encoder width, 64-d GRU."""
    return RAFT(
        hidden_dim=64,
        context_dim=64,
        enc_dim=128,
        enc_base=32,
        motion_dims=(96, 64, 48, 32, 64),
        head_hidden=128,
        mask_hidden=128,
        cnet_norm="instance",
        use_pallas=use_pallas,
        remat=remat,
    )
