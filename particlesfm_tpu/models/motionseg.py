"""Trajectory motion-segmentation network: transformer encoder + OANet decoder.

Semantic reimplementation (channel-last, Flax) of the reference's traj_oa_depth
model (/root/reference/motion_seg/core/network/traj_oa_depth.py and oanet.py):

  per-point 10-d features (xy + 2-d motion + depth-backprojected 3-d point +
  3-d scene motion, traj_oa_depth.py:72-114)
  -> two 1x1 projections 10->16->16
  -> torch nn.Transformer(d_model=16, nhead=4, 2 enc + 2 dec layers, ff=64)
     over the time axis with pad masks (traj_oa_depth.py:25-60)
  -> max-pool over time -> per-trajectory feature
  -> OANBlock (order-aware filtering: PointCN residual blocks, diff_pool to 100
     soft clusters, OAFilter spatial correlation, 128 channels, depth 8 —
     oanet.py:13-206)
  -> 1 logit per trajectory (sigmoid > 0.5 = dynamic).

Layout is [B, N, ...] channel-last so every 1x1 conv is a Dense on the MXU; the
windowed batches shard data-parallel over the device mesh.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn


def _instance_norm_points(x, eps=1e-3):
    """InstanceNorm2d equivalent for [B, N, C]: normalize over N per (B, C)."""
    mean = jnp.mean(x, axis=1, keepdims=True)
    var = jnp.var(x, axis=1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps)


class _TransformerLayer(nn.Module):
    """Post-norm transformer layer (torch nn.TransformerEncoder/DecoderLayer)."""
    d_model: int = 16
    nhead: int = 4
    dim_ff: int = 64
    cross: bool = False

    @nn.compact
    def __call__(self, x, memory=None, pad_mask=None, train: bool = False):
        # pad_mask: [B, L] True where VALID
        def attn_mask(q_len, kv_mask):
            if kv_mask is None:
                return None
            return kv_mask[:, None, None, :]  # [B, 1, 1, L]

        y = nn.MultiHeadDotProductAttention(
            num_heads=self.nhead, qkv_features=self.d_model, name="self_attn"
        )(x, x, mask=attn_mask(x.shape[1], pad_mask))
        x = nn.LayerNorm(name="norm1")(x + y)
        if self.cross:
            y = nn.MultiHeadDotProductAttention(
                num_heads=self.nhead, qkv_features=self.d_model, name="cross_attn"
            )(x, memory, mask=attn_mask(x.shape[1], pad_mask))
            x = nn.LayerNorm(name="norm_cross")(x + y)
        y = nn.Dense(self.dim_ff, name="ff1")(x)
        y = nn.Dense(self.d_model, name="ff2")(nn.relu(y))
        return nn.LayerNorm(name="norm2")(x + y)


class TrajTransformer(nn.Module):
    """pt_transformer: project 10-d features, run enc-dec over time, max-pool."""
    d_model: int = 16

    @nn.compact
    def __call__(self, feats, valid, train: bool = False):
        # feats: [B, N, L, 10], valid: [B, N, L] bool
        B, N, L, _ = feats.shape
        x = nn.relu(nn.Dense(16, name="input_fc1")(feats))
        x = nn.relu(nn.Dense(self.d_model, name="fc2")(x))
        x = x.reshape(B * N, L, self.d_model)
        pad = valid.reshape(B * N, L)
        src = x
        for i in range(2):
            src = _TransformerLayer(name=f"enc{i}")(src, pad_mask=pad, train=train)
        tgt = x
        for i in range(2):
            tgt = _TransformerLayer(cross=True, name=f"dec{i}")(
                tgt, memory=src, pad_mask=pad, train=train
            )
        tgt = tgt.reshape(B, N, L, self.d_model)
        # masked max over time; fully-invalid (padded) trajectories pool to 0,
        # not -inf — otherwise the sentinel detonates the decoder
        neg = jnp.full_like(tgt, -1e9)
        pooled = jnp.max(jnp.where(valid[..., None], tgt, neg), axis=2)
        any_valid = jnp.any(valid, axis=2)[..., None]
        return jnp.where(any_valid, pooled, 0.0)  # [B, N, d_model]


class PointCN(nn.Module):
    channels: int
    out_channels: int | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        out_ch = self.out_channels or self.channels
        y = _instance_norm_points(x)
        y = nn.BatchNorm(use_running_average=not train, name="bn1")(y)
        y = nn.Dense(out_ch, name="conv1")(nn.relu(y))
        y = _instance_norm_points(y)
        y = nn.BatchNorm(use_running_average=not train, name="bn2")(y)
        y = nn.Dense(out_ch, name="conv2")(nn.relu(y))
        if out_ch != x.shape[-1]:
            x = nn.Dense(out_ch, name="shortcut")(x)
        return x + y


class DiffPool(nn.Module):
    clusters: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        # x: [B, N, C] -> [B, K, C] via soft assignment over points
        e = _instance_norm_points(x)
        e = nn.BatchNorm(use_running_average=not train, name="bn")(e)
        e = nn.Dense(self.clusters, name="embed")(nn.relu(e))     # [B, N, K]
        S = jax.nn.softmax(e, axis=1)
        return jnp.einsum("bnk,bnc->bkc", S, x)


class DiffUnpool(nn.Module):
    clusters: int

    @nn.compact
    def __call__(self, x_up, x_down, train: bool = False):
        # x_up: [B, N, C] (pre-pool features), x_down: [B, K, C]
        e = _instance_norm_points(x_up)
        e = nn.BatchNorm(use_running_average=not train, name="bn")(e)
        e = nn.Dense(self.clusters, name="embed")(nn.relu(e))     # [B, N, K]
        S = jax.nn.softmax(e, axis=2)
        return jnp.einsum("bnk,bkc->bnc", S, x_down)


class OAFilter(nn.Module):
    channels: int
    points: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        # x: [B, K, C]; the "spatial correlation layer" mixes the cluster axis
        y = _instance_norm_points(x)
        y = nn.BatchNorm(use_running_average=not train, name="bn1")(y)
        y = nn.Dense(self.channels, name="conv1")(nn.relu(y))
        # cluster mixing: treat clusters as channels
        z = jnp.swapaxes(y, 1, 2)                                  # [B, C, K]
        z = nn.BatchNorm(use_running_average=not train, name="bn2")(z)
        z = nn.Dense(self.points, name="conv2")(nn.relu(z))
        y = y + jnp.swapaxes(z, 1, 2)
        y2 = _instance_norm_points(y)
        y2 = nn.BatchNorm(use_running_average=not train, name="bn3")(y2)
        y2 = nn.Dense(self.channels, name="conv3")(nn.relu(y2))
        return x + y2


class OANBlock(nn.Module):
    net_channels: int = 128
    depth: int = 8
    clusters: int = 100

    @nn.compact
    def __call__(self, x, train: bool = False):
        # x: [B, N, C_in] -> logits [B, N]
        c = self.net_channels
        x1 = nn.Dense(c, name="conv1")(x)
        for i in range(self.depth // 2):
            x1 = PointCN(c, name=f"l1_1_{i}")(x1, train)
        xd = DiffPool(self.clusters, name="down1")(x1, train)
        for i in range(self.depth // 2):
            xd = OAFilter(c, self.clusters, name=f"l2_{i}")(xd, train)
        xu = DiffUnpool(self.clusters, name="up1")(x1, xd, train)
        out = jnp.concatenate([x1, xu], axis=-1)
        out = PointCN(2 * c, c, name="l1_2_0")(out, train)
        for i in range(1, self.depth // 2):
            out = PointCN(c, name=f"l1_2_{i}")(out, train)
        return nn.Dense(1, name="output")(out)[..., 0]


def backproject_tracks(depth_maps, traj, hw: Tuple[int, int]):
    """Per-point 3-d backprojection with the assumed intrinsics f=(h+w)/2,
    c=(w/2, h/2) (traj_oa_depth.py:77-90). depth_maps: [B, L, H, W];
    traj: [B, N, L, 2] normalized to [0, 1]. Returns [B, N, L, 3]."""
    h, w = hw
    f = (h + w) / 2.0
    x_pix = jnp.clip((traj[..., 0] * w).astype(jnp.int32), 0, w - 1)
    y_pix = jnp.clip((traj[..., 1] * h).astype(jnp.int32), 0, h - 1)
    B, N, L = x_pix.shape
    b_idx = jnp.arange(B)[:, None, None]
    l_idx = jnp.arange(L)[None, None, :]
    d = depth_maps[b_idx, l_idx, y_pix, x_pix]                     # [B, N, L]
    X = d * (x_pix.astype(d.dtype) - w / 2.0) / f
    Y = d * (y_pix.astype(d.dtype) - h / 2.0) / f
    return jnp.stack([X, Y, d], axis=-1)


def augment_traj(traj, depth_maps, valid, hw):
    """10-d per-point features (traj_oa_depth.py:103-114). Temporal diffs are
    zeroed where the next observation is invalid."""
    traj3d = backproject_tracks(depth_maps, traj, hw)
    nxt_ok = valid[..., 1:, None].astype(traj.dtype)
    m2 = jnp.concatenate(
        [(traj[..., 1:, :] - traj[..., :-1, :]) * nxt_ok, jnp.zeros_like(traj[..., :1, :])],
        axis=-2,
    )
    m3 = jnp.concatenate(
        [(traj3d[..., 1:, :] - traj3d[..., :-1, :]) * nxt_ok, jnp.zeros_like(traj3d[..., :1, :])],
        axis=-2,
    )
    return jnp.concatenate([traj, m2, traj3d, m3], axis=-1)        # [B, N, L, 10]


class TrajOADepth(nn.Module):
    """Full model: augment -> trajectory transformer -> OANet head -> logits."""
    input_hw: Tuple[int, int] = (240, 424)

    @nn.compact
    def __call__(self, traj, depth_maps, valid, train: bool = False):
        """traj: [B, N, L, 2] normalized coords; depth_maps: [B, L, H, W] in [0,1];
        valid: [B, N, L] bool. Returns motion logits [B, N] (sigmoid -> dynamic)."""
        feats = augment_traj(traj, depth_maps, valid, self.input_hw)
        enc = TrajTransformer(name="joint_encoder")(feats, valid, train)
        return OANBlock(name="decoder")(enc, train)
