"""DeviceSampleBank fallback sizing: a scene with zero rows on one side
borrows the other side's rows, and those borrowed rows must fit the bank
buffers even when that side is the dataset-wide maximum (regression: the
classes13 multicat run crashed here — nmax was computed from the raw neg
lists, then a zero-neg scene's fallback rows overflowed it)."""

import numpy as np
import jax

from latent_diffusion_models_for_shape_sdfs_tpu.data.device_bank import (
    DeviceSampleBank)


class _FakeDs:
    def __init__(self, pos, neg):
        self.pos, self.neg = pos, neg

    def __len__(self):
        return len(self.pos)


def _rows(n, sign):
    r = np.random.default_rng(abs(n) + (sign > 0)).normal(
        size=(n, 4)).astype(np.float32)
    r[:, 3] = sign * np.abs(r[:, 3])
    return r


def test_zero_neg_scene_with_max_pos():
    # scene 0: the LARGEST pos list and zero negs -> fallback rows are
    # longer than every raw neg list
    ds = _FakeDs(
        pos=[_rows(300, -1), _rows(50, -1)],
        neg=[_rows(0, +1), _rows(80, +1)],
    )
    bank = DeviceSampleBank.from_dataset(ds)
    assert bank.neg.shape[1] >= 300
    assert int(bank.neg_count[0]) == 300
    xyz, sdf = bank.sample_batch(jax.random.PRNGKey(0),
                                 np.asarray([0, 1]), 64)
    assert xyz.shape == (2, 64, 3) and sdf.shape == (2, 64)
    assert np.isfinite(np.asarray(sdf)).all()


def test_zero_pos_scene():
    ds = _FakeDs(
        pos=[_rows(0, -1)],
        neg=[_rows(120, +1)],
    )
    bank = DeviceSampleBank.from_dataset(ds)
    assert bank.pos.shape[1] >= 120
    assert int(bank.pos_count[0]) == 120
