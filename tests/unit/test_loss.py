"""Loss + HNM tests with naive-numpy oracles."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dan_tpu.config import TrainConfig
from dan_tpu.train.loss import detection_loss, smooth_l1


def _softmax_ce(logits, label):
    e = np.exp(logits - logits.max())
    p = e / e.sum()
    return -np.log(p[label])


class TestSmoothL1:
    def test_values(self):
        x = jnp.array([-2.0, -0.5, 0.0, 0.5, 2.0])
        got = np.asarray(smooth_l1(x))
        np.testing.assert_allclose(got, [1.5, 0.125, 0.0, 0.125, 1.5])


class TestDetectionLoss:
    def _make_case(self, rng, B=2, A=64):
        cls_logits = rng.normal(size=(B, A, 2)).astype(np.float32)
        loc_preds = rng.normal(size=(B, A, 4)).astype(np.float32)
        cls_targets = rng.choice([0, 0, 0, 0, 0, 0, 1], size=(B, A)).astype(np.int32)
        loc_targets = rng.normal(size=(B, A, 4)).astype(np.float32)
        return cls_logits, loc_preds, cls_targets, loc_targets

    def test_vs_naive_oracle(self, rng):
        cls_logits, loc_preds, cls_targets, loc_targets = self._make_case(rng)
        cfg = TrainConfig(hnm_ratio=3.0, hnm_min_negatives=2, loc_loss_weight=1.0)
        total, metrics = detection_loss(
            jnp.asarray(cls_logits),
            jnp.asarray(loc_preds),
            jnp.asarray(cls_targets),
            jnp.asarray(loc_targets),
            cfg,
        )
        # naive oracle: per image select top (3*npos) hardest negatives by CE
        B, A, _ = cls_logits.shape
        cls_sum, loc_sum, total_pos = 0.0, 0.0, 0
        for b in range(B):
            ce = np.array(
                [_softmax_ce(cls_logits[b, a], max(cls_targets[b, a], 0)) for a in range(A)]
            )
            pos = cls_targets[b] == 1
            neg = cls_targets[b] == 0
            npos = int(pos.sum())
            total_pos += npos
            k = min(max(int(3.0 * npos), 2), int(neg.sum()))
            neg_ce = np.where(neg, ce, -np.inf)
            keep = np.argsort(-neg_ce, kind="stable")[:k]
            cls_sum += ce[pos].sum() + ce[keep].sum()
            diff = loc_preds[b] - loc_targets[b]
            sl1 = np.where(np.abs(diff) < 1, 0.5 * diff**2, np.abs(diff) - 0.5).sum(-1)
            loc_sum += sl1[pos].sum()
        want = (cls_sum + loc_sum) / max(total_pos, 1)
        np.testing.assert_allclose(float(total), want, rtol=2e-4)
        assert float(metrics["num_pos"]) == total_pos

    def test_no_positives_min_negatives(self, rng):
        cls_logits = jnp.asarray(rng.normal(size=(1, 32, 2)).astype(np.float32))
        cfg = TrainConfig(hnm_min_negatives=8)
        total, metrics = detection_loss(
            cls_logits,
            jnp.zeros((1, 32, 4)),
            jnp.zeros((1, 32), jnp.int32),
            jnp.zeros((1, 32, 4)),
            cfg,
        )
        assert float(metrics["num_neg_selected"]) == 8
        assert np.isfinite(float(total))
        assert float(metrics["loc_loss"]) == 0.0

    def test_ignore_anchors_excluded(self, rng):
        cls_logits = jnp.asarray(rng.normal(size=(1, 16, 2)).astype(np.float32))
        targets = np.zeros((1, 16), np.int32)
        targets[0, :8] = -1  # ignore band
        cfg = TrainConfig(hnm_min_negatives=100)  # select all negatives
        _, metrics = detection_loss(
            cls_logits,
            jnp.zeros((1, 16, 4)),
            jnp.asarray(targets),
            jnp.zeros((1, 16, 4)),
            cfg,
        )
        assert float(metrics["num_neg_selected"]) == 8  # only true negatives

    def test_select_topk_desc_ties_match_rank_oracle(self, rng):
        # Heavy ties: values drawn from 4 distinct levels so the cumsum
        # tie-break path is exercised; oracle = stable double-argsort rank.
        from dan_tpu.train.loss import _select_topk_desc

        vals = rng.choice([0.0, 1.0, 2.0, 3.0], size=(5, 97)).astype(np.float32)
        vals[3, :] = -np.inf  # all-masked row
        ks = np.array([0, 1, 5, 0, 97], np.int32)
        got = np.asarray(_select_topk_desc(jnp.asarray(vals), jnp.asarray(ks)))
        for b in range(5):
            order = np.argsort(-vals[b], kind="stable")
            ranks = np.argsort(order, kind="stable")
            want = ranks < ks[b]
            np.testing.assert_array_equal(got[b], want, err_msg=f"row {b}")

    def test_gradients_flow(self, rng):
        cls_logits, loc_preds, cls_targets, loc_targets = self._make_case(rng, B=1, A=32)
        cfg = TrainConfig()

        def f(cl, lp):
            return detection_loss(
                cl, lp, jnp.asarray(cls_targets), jnp.asarray(loc_targets), cfg
            )[0]

        g_cl, g_lp = jax.grad(f, argnums=(0, 1))(
            jnp.asarray(cls_logits), jnp.asarray(loc_preds)
        )
        assert np.isfinite(np.asarray(g_cl)).all()
        assert np.isfinite(np.asarray(g_lp)).all()
        # loc grads only on positives
        pos = cls_targets[0] == 1
        assert (np.abs(np.asarray(g_lp)[0, ~pos]) == 0).all()
        assert (np.abs(np.asarray(g_lp)[0, pos]).sum() > 0)
