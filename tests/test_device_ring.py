"""DeviceRing: device-resident stream buffer semantics."""

import numpy as np

import jax.numpy as jnp

from gr_lora_tpu.pipeline.device_ring import DeviceRing


def _chunk(c, lg, seed):
    rng = np.random.default_rng(seed)
    return rng.standard_normal((c, lg, 2)).astype(np.float32)


def test_append_slice_roundtrip():
    r = DeviceRing(3, 4096)
    a, b = _chunk(3, 1000, 0), _chunk(3, 500, 1)
    r.append(a)
    r.append(b)
    got = np.asarray(r.slice(0, 1500))
    np.testing.assert_array_equal(got, np.concatenate([a, b], axis=1))
    assert r.ingest_bytes == a.nbytes + b.nbytes


def test_history_prefill_is_zero():
    r = DeviceRing(2, 4096, history=256)
    a = _chunk(2, 100, 0)
    r.append(a)
    got = np.asarray(r.slice(0, 356))
    assert np.all(got[:, :256] == 0)
    np.testing.assert_array_equal(got[:, 256:], a)


def test_trim_then_compact_on_overflow():
    r = DeviceRing(2, 1024)
    cap0 = r.cap
    ref = np.zeros((2, 0, 2), np.float32)
    base = 0
    for seed in range(12):
        c = _chunk(2, 300, seed)
        r.append(c)
        ref = np.concatenate([ref, c], axis=1)
        cut = max(ref.shape[1] - 700, 0)       # keep last <=700
        r.trim(cut)
        base += cut
        ref = ref[:, cut:]
        np.testing.assert_array_equal(np.asarray(r.slice(0, ref.shape[1])),
                                      ref)
    assert r.cap == cap0                        # compaction, not growth


def test_growth_preserves_contents():
    r = DeviceRing(2, 1024)
    cap0 = r.cap
    big = _chunk(2, 5000, 7)
    r.append(big)
    assert r.cap > cap0
    np.testing.assert_array_equal(np.asarray(r.slice(0, 5000)), big)


def test_gather_windows():
    r = DeviceRing(4, 8192)
    a = _chunk(4, 3000, 3)
    r.append(a)
    chs = np.array([0, 2, 3, 1], np.int32)
    los = np.array([0, 100, 2000, 999], np.int64)
    got = np.asarray(r.gather(chs, los, 500))
    for i in range(4):
        np.testing.assert_array_equal(got[i], a[chs[i], los[i]:los[i] + 500])


def test_device_input_not_counted_as_ingest():
    r = DeviceRing(1, 2048)
    r.append(jnp.ones((1, 100, 2), jnp.float32))
    assert r.ingest_bytes == 0
    assert np.all(np.asarray(r.slice(0, 100)) == 1.0)
