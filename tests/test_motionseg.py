"""Motion-segmentation subsystem tests: windowing, training, inference."""
import numpy as np
import jax
import jax.numpy as jnp

from particlesfm_tpu.models.motionseg import TrajOADepth
from particlesfm_tpu.motionseg import (
    cut_windows, segment_tracks, create_train_state, train_step, eval_step,
    weighted_bce, cls_iou,
)
from particlesfm_tpu.tracks.store import TrackArrays


def test_cut_windows():
    assert [w.tolist() for w in cut_windows(5, 10)] == [[0, 1, 2, 3, 4]]
    ws = cut_windows(25, 10)
    assert [list(w[:2]) for w in ws] == [[0, 1], [10, 11], [15, 16]]
    assert ws[-1][-1] == 24  # last window realigned to the end
    assert all(len(w) == 10 for w in ws)


def test_weighted_bce_balance():
    logits = jnp.zeros((1, 4))
    targets = jnp.asarray([[1.0, 0.0, 0.0, 0.0]])
    valid = jnp.ones((1, 4), bool)
    # balanced weighting: the one positive sample carries weight 3
    loss = weighted_bce(logits, targets, valid)
    assert abs(float(loss) - float(jnp.log(2.0))) < 1e-5


def make_batch(rng, B=2, N=32, L=8, H=16, W=24):
    """Dynamic trajectories drift upward; static ones follow a smooth field."""
    base = rng.uniform(0.2, 0.8, (B, N, 1, 2))
    t = np.arange(L).reshape(1, 1, L, 1) / L
    label = (rng.random((B, N)) < 0.4).astype(np.float32)
    static_motion = np.concatenate([0.05 * t, 0.0 * t], -1)
    dyn_motion = np.concatenate([-0.1 * t, 0.15 * t], -1)
    traj = base + np.where(label[..., None, None] > 0, dyn_motion, static_motion)
    depth = rng.uniform(0.3, 0.7, (B, L, H, W))
    return {
        "traj": jnp.asarray(traj, jnp.float32),
        "depth": jnp.asarray(depth, jnp.float32),
        "valid": jnp.ones((B, N, L), bool),
        "label": jnp.asarray(label),
        "traj_valid": jnp.ones((B, N), bool),
    }


def test_overfit_tiny_batch():
    rng = np.random.default_rng(0)
    batch = make_batch(rng)
    model = TrajOADepth(input_hw=(16, 24))
    state, tx = create_train_state(model, jax.random.PRNGKey(0), batch, learning_rate=3e-4)
    for _ in range(150):
        state, metrics = train_step(model, tx, state, batch)
    final = eval_step(model, state, batch)
    assert float(final["iou"]) > 0.9, f"failed to overfit: IoU {float(final['iou'])}"


def test_segment_tracks_windowing_and_merge():
    rng = np.random.default_rng(1)
    N, T, H, W = 20, 23, 16, 24
    xy = np.zeros((N, T, 2), np.float32)
    mask = np.zeros((N, T), bool)
    for n in range(N):
        s = rng.integers(0, T - 6)
        ln = rng.integers(5, T - s + 1)
        mask[n, s : s + ln] = True
        xy[n, s : s + ln] = rng.uniform(0, [W, H], (ln, 2))
    tracks = TrackArrays(xy=xy, mask=mask)
    dynamic_rows = set(rng.choice(N, 8, replace=False).tolist())

    def fake_apply(traj, depth, valid):
        # classify by mean x coordinate parity trick: mark our chosen rows
        # via a lookup from coordinates is impossible; instead return logits
        # high for trajectories whose first x > 0.5 (deterministic rule)
        first = jnp.sum(jnp.where(valid[..., None], traj, 0), axis=2) / jnp.maximum(
            jnp.sum(valid, 2, keepdims=True), 1
        )
        return jnp.where(first[..., 0] > 0.5, 10.0, -10.0)

    labeled = segment_tracks(
        fake_apply, tracks, np.zeros((T, H, W), np.float32), (H, W), window_size=10
    )
    assert labeled.labels is not None
    # labels only where observed
    assert not np.any(labeled.labels[~mask])
    # the deterministic rule must be reproduced on observed frames
    mean_x = (xy[..., 0] * mask).sum(1) / np.maximum(mask.sum(1), 1) / W
    for n in range(N):
        obs = mask[n]
        if mean_x[n] > 0.55:
            assert labeled.labels[n, obs].mean() > 0.5
        elif mean_x[n] < 0.45:
            assert labeled.labels[n, obs].mean() < 0.5


def test_segment_tracks_chunked_matches_unchunked():
    """Track-axis chunking (HBM bound at protocol scale: 5 windows x 100k
    tracks would demand ~32 GB unchunked) must reproduce the one-call labels
    for a per-trajectory-independent classifier."""
    rng = np.random.default_rng(3)
    N, T, H, W = 64, 12, 16, 24
    xy = rng.uniform(0, [W, H], (N, T, 2)).astype(np.float32)
    mask = np.ones((N, T), bool)
    tracks = TrackArrays(xy=xy, mask=mask)

    def fake_apply(traj, depth, valid):
        first = jnp.sum(jnp.where(valid[..., None], traj, 0), axis=2) / jnp.maximum(
            jnp.sum(valid, 2, keepdims=True), 1
        )
        return jnp.where(first[..., 0] > 0.5, 10.0, -10.0)

    depth = np.zeros((T, H, W), np.float32)
    ref = segment_tracks(fake_apply, tracks, depth, (H, W), window_size=10)
    chunked = segment_tracks(fake_apply, tracks, depth, (H, W), window_size=10,
                             max_cells=32)  # forces many small chunks + padding
    np.testing.assert_array_equal(chunked.labels, ref.labels)


def test_reference_dict_roundtrip_with_labels():
    rng = np.random.default_rng(2)
    xy = rng.uniform(0, 100, (5, 8, 2)).astype(np.float32)
    mask = rng.random((5, 8)) < 0.7
    mask[:, 0] = True
    labels = (rng.random((5, 8)) < 0.5).astype(np.int8) * mask
    tr = TrackArrays(xy=xy, mask=mask, labels=labels)
    d = tr.to_reference_dict()
    back = TrackArrays.from_reference_dict(d, num_frames=8)
    assert back.num_tracks == 5
    np.testing.assert_array_equal(back.mask, mask)
    np.testing.assert_array_equal(back.labels[mask], labels[mask])


def test_segment_tracks_u16_matches_f32():
    """An apply fn declaring accepts_u16 receives fixed-point coords and must
    produce the same labels after on-device rescale (pipeline/run.py parity:
    the quantization step is 1/65535 of the frame, ~0.016 px)."""
    rng = np.random.default_rng(4)
    N, T, H, W = 48, 12, 16, 24
    xy = rng.uniform(0, [W, H], (N, T, 2)).astype(np.float32)
    mask = np.ones((N, T), bool)
    tracks = TrackArrays(xy=xy, mask=mask)
    depth = np.zeros((T, H, W), np.float32)

    def base(traj, depth_, valid):
        first = jnp.sum(jnp.where(valid[..., None], traj, 0), axis=2) / jnp.maximum(
            jnp.sum(valid, 2, keepdims=True), 1
        )
        return jnp.where(first[..., 0] > 0.5, 10.0, -10.0)

    def u16_apply(traj, depth_, valid):
        assert traj.dtype == jnp.uint16
        return base(traj.astype(jnp.float32) / 65535.0, depth_, valid)

    u16_apply.accepts_u16 = True
    ref = segment_tracks(base, tracks, depth, (H, W), window_size=10)
    got = segment_tracks(u16_apply, tracks, depth, (H, W), window_size=10)
    np.testing.assert_array_equal(got.labels, ref.labels)
