"""Tests: motion-seg data pipeline, training CLI smoke, RAFT weight converter."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from particlesfm_tpu.models.raft import RAFT
from particlesfm_tpu.models.convert_raft import (
    convert_torch_raft, fake_torch_state_dict_from_flax,
)
from particlesfm_tpu.motionseg.data import (
    encode_flow_png16, decode_flow_png16, write_flow_png, read_flow_png,
    find_traj_label, synthetic_motion_batch,
)


class TestFlowPng:
    def test_encoding_roundtrip(self):
        rng = np.random.default_rng(0)
        flow = rng.uniform(-100, 100, (8, 12, 2)).astype(np.float32)
        dec = decode_flow_png16(encode_flow_png16(flow))
        np.testing.assert_allclose(dec, flow, atol=0.01)

    def test_file_roundtrip(self, tmp_path):
        rng = np.random.default_rng(1)
        flow = rng.uniform(-50, 50, (10, 14, 2)).astype(np.float32)
        write_flow_png(tmp_path / "f.png", flow)
        back = read_flow_png(tmp_path / "f.png")
        np.testing.assert_allclose(back, flow, atol=0.01)


class TestTrajLabel:
    def test_majority_vote(self):
        H, W, L = 20, 30, 4
        masks = np.zeros((L, H, W))
        masks[:, :, :15] = 1.0   # left half dynamic
        traj = np.zeros((2, L, 2), np.float32)
        traj[0, :, 0] = 5.0      # stays left -> dynamic
        traj[1, :, 0] = 25.0     # stays right -> static
        traj[:, :, 1] = 10.0
        valid = np.ones((2, L), bool)
        labels = find_traj_label(traj, valid, masks)
        assert labels.tolist() == [1.0, 0.0]


class TestTrainCliSmoke:
    def test_synthetic_one_epoch(self, tmp_path):
        from particlesfm_tpu.motionseg.train_cli import main
        rc = main([
            "--synthetic", "--out_dir", str(tmp_path), "--epochs", "1",
            "--steps_per_epoch", "3", "--batch_size", "2",
            "--resolution", "64", "96",
        ])
        assert rc == 0
        assert (tmp_path / "checkpoint_best.msgpack").exists()
        assert (tmp_path / "test_metrics.txt").exists()

    def test_resume(self, tmp_path):
        from particlesfm_tpu.motionseg.train_cli import main
        main(["--synthetic", "--out_dir", str(tmp_path), "--epochs", "1",
              "--steps_per_epoch", "2", "--batch_size", "2",
              "--resolution", "64", "96"])
        rc = main(["--synthetic", "--out_dir", str(tmp_path), "--epochs", "1",
                   "--steps_per_epoch", "2", "--batch_size", "2",
                   "--resolution", "64", "96",
                   "--resume", str(tmp_path / "checkpoint_best.msgpack")])
        assert rc == 0


class TestRaftConverter:
    def test_structural_roundtrip(self):
        model = RAFT()
        img = jnp.zeros((64, 96, 3), jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), img, img, iters=1)
        variables = jax.tree.map(np.asarray, dict(variables))
        sd = fake_torch_state_dict_from_flax(variables)
        back = convert_torch_raft(sd)

        flat_orig = jax.tree_util.tree_flatten_with_path(variables["params"])[0]
        flat_back = jax.tree_util.tree_flatten_with_path(back["params"])[0]
        keys_orig = {jax.tree_util.keystr(k) for k, _ in flat_orig}
        keys_back = {jax.tree_util.keystr(k) for k, _ in flat_back}
        assert keys_orig == keys_back, (
            f"missing: {keys_orig - keys_back}, extra: {keys_back - keys_orig}"
        )
        lookup = {jax.tree_util.keystr(k): v for k, v in flat_orig}
        for k, v in flat_back:
            np.testing.assert_array_equal(v, lookup[jax.tree_util.keystr(k)])
        # batch stats too
        assert "batch_stats" in back
        sb = jax.tree_util.tree_flatten_with_path(back["batch_stats"])[0]
        so = {jax.tree_util.keystr(k): v
              for k, v in jax.tree_util.tree_flatten_with_path(variables["batch_stats"])[0]}
        for k, v in sb:
            np.testing.assert_array_equal(v, so[jax.tree_util.keystr(k)])

    def test_converted_weights_run(self):
        model = RAFT()
        img = jnp.zeros((64, 96, 3), jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), img, img, iters=1)
        variables = jax.tree.map(np.asarray, dict(variables))
        back = convert_torch_raft(fake_torch_state_dict_from_flax(variables))
        out = model.apply(back, img, img, iters=1)
        ref = model.apply(variables, img, img, iters=1)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_synthetic_batch_shapes():
    rng = np.random.default_rng(0)
    b = synthetic_motion_batch(rng, B=2, N=16, L=5)
    assert b["traj"].shape == (2, 16, 5, 2)
    assert b["label"].shape == (2, 16)
