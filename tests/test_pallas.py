"""Pallas fused-pruning kernel vs the scan implementation (interpret mode
on CPU; on real TPU the compiled kernel matches to f32 transcendental
tolerance ~1e-4 relative)."""

import numpy as np
import jax.numpy as jnp

from gphocs_tpu.config import parse_control_text
from gphocs_tpu.model import build_poptree
from gphocs_tpu.ops.pruning import data_log_likelihood
from gphocs_tpu.ops.pruning_pallas import data_log_likelihood_pallas
from gphocs_tpu.rng_host import HostRng
from gphocs_tpu.sampler.init import init_gen_state, sample_pop_parameters
from gphocs_tpu.state import GenState, SeqData

from tests.test_control import SAMPLE_CTL


def test_pallas_pruning_matches_scan():
    cfg = parse_control_text(SAMPLE_CTL)
    tree = build_poptree(cfg)
    rng = HostRng(17, 5)
    params = sample_pop_parameters(tree, rng)
    gen = init_gen_state(tree, params, rng, 16, np.ones(16),
                         dtype=np.float32)
    r = np.random.RandomState(3)
    L, S, P = 16, 8, 6
    seq = SeqData(
        leaf_base=jnp.asarray(r.randint(0, 5, (L, S, P)).astype(np.int8)),
        group_id=jnp.asarray(np.tile(np.arange(P, dtype=np.int32), (L, 1))),
        group_count=jnp.asarray(r.randint(1, 9, (L, P)).astype(np.float32)),
        group_nphases=jnp.asarray(np.ones((L, P), np.float32)),
        pattern_valid=jnp.asarray(np.ones((L, P), bool)))
    jgen = GenState(*[jnp.asarray(x) for x in gen])
    ref = data_log_likelihood(jgen, seq)
    pal = data_log_likelihood_pallas(jgen, seq, interpret=True)
    np.testing.assert_allclose(np.asarray(pal), np.asarray(ref), rtol=2e-5)
