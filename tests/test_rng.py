"""Golden tests of the vectorized legacy RNG and reflect() against values
(XLA CPU f64 division is ~1ulp off vs libm, so tolerances are ~1e-12, not 0)
produced by the reference C implementation (src/utils.c) compiled with
gcc -O2, seed 12345, 3 loci + 1 general slot."""

import jax.numpy as jnp
import numpy as np

from gphocs_tpu import rng as R
from gphocs_tpu.utils import reflect

GOLD_RNDU_SLOT0 = [
    0.0042688455914678958, 0.62853436425211839, 0.95951417036121711,
    0.066568566791829653, 0.33884242226486094, 0.25929171797179151,
    0.30696066853124648, 0.27638592311996035, 0.27231839174055494,
    0.92301977935130708,
]
# All slots are seeded identically in legacy mode -> general slot repeats slot0.
GOLD_RNDU_GENERAL = GOLD_RNDU_SLOT0[:5]
GOLD_RND2NORMAL8_SLOT1 = [
    0.66878961090114375, -0.62978615503667335, -0.98304464283311499,
    -0.96972107693339271, 0.557807077441971, -1.0561921282874003,
    -0.95513209233305907, 0.50244312769355037,
]
GOLD_RNDNORMAL_SLOT2 = [
    -0.82205829204275882, -0.94807421769542499, -0.18954793512492538,
    0.12070680375315508, 1.8794910910790084,
]


def _mask(k, idx):
    m = np.zeros(k, bool)
    m[idx] = True
    return jnp.asarray(m)


def test_rndu_stream_matches_c():
    st = R.init_legacy(4, 12345)
    outs = []
    for _ in range(10):
        u, st = R.rndu(st, _mask(4, 0))
        outs.append(float(u[0]))
    np.testing.assert_allclose(outs, GOLD_RNDU_SLOT0, rtol=0, atol=5e-15)


def test_general_slot_stream():
    st = R.init_legacy(4, 12345)
    outs = []
    for _ in range(5):
        u, st = R.general_draw_u(st)
        outs.append(float(u))
    np.testing.assert_allclose(outs, GOLD_RNDU_GENERAL, rtol=0, atol=5e-15)


def test_rnd2normal8_matches_c():
    st = R.init_legacy(4, 12345)
    outs = []
    for _ in range(8):
        z, st = R.rnd2normal8(st, _mask(4, 1))
        outs.append(float(z[1]))
    np.testing.assert_allclose(outs, GOLD_RND2NORMAL8_SLOT1, rtol=1e-11)


def test_rndnormal_matches_c():
    st = R.init_legacy(4, 12345)
    outs = []
    for _ in range(5):
        z, st = R.rndnormal(st, _mask(4, 2))
        outs.append(float(z[2]))
    np.testing.assert_allclose(outs, GOLD_RNDNORMAL_SLOT2, rtol=1e-11)


def test_masked_lanes_do_not_advance():
    st = R.init_legacy(4, 12345)
    # draw 3 times on lane 1 only; lane 0 must still produce the first value
    for _ in range(3):
        _, st = R.rndu(st, _mask(4, 1))
    u, st = R.rndu(st, _mask(4, 0))
    np.testing.assert_allclose(float(u[0]), GOLD_RNDU_SLOT0[0], atol=5e-15)


def test_parallel_draw_all_lanes():
    st = R.init_legacy(4, 12345)
    u, st = R.rndu(st, jnp.ones(4, bool))
    np.testing.assert_allclose(np.asarray(u), GOLD_RNDU_SLOT0[0])


def test_reflect_matches_c():
    cases = [
        (1.7, 0.0, 1.0, 0.2999999980000001),
        (-3.3, 0.0, 1.0, 0.69999999200000018),
        (0.5, 0.0, 1.0, 0.5),
        (27.25, 1.0, 2.0, 1.2500000520000043),
        (-27.25, 1.0, 2.0, 1.2500000580000048),
        (5.0, 3.0, 3.0000000001, 3.00000000005),  # empty interval -> midpoint
    ]
    x = jnp.array([c[0] for c in cases])
    a = jnp.array([c[1] for c in cases])
    b = jnp.array([c[2] for c in cases])
    got = reflect(x, a, b)
    np.testing.assert_allclose(np.asarray(got), [c[3] for c in cases], rtol=1e-12)


def test_decorrelated_streams_differ():
    st = R.init_decorrelated(8, 0)
    u, _ = R.rndu(st, jnp.ones(8, bool))
    assert len(set(np.asarray(u).tolist())) > 4
