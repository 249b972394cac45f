"""CGM noise: bit-exact compat path vs reference golden; native path laws."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simglucose_tpu.compat.noise import reference_cgm_noise
from simglucose_tpu.ops.noise import (
    MDL_SAMPLE_TIME,
    johnson_transform_su,
    noise_lattice_init,
    noise_next,
)
from simglucose_tpu.params import load_sensor_params, sensor_record, sensor_sample_time

from conftest import load_golden


@pytest.mark.parametrize("sensor", ["Dexcom", "GuardianRT", "Navigator"])
@pytest.mark.parametrize("seed", [1, 2, 3])
def test_compat_noise_bitexact(sensor, seed):
    golden = load_golden("cgm_noise.npz")[f"{sensor}_s{seed}"]
    ours = reference_cgm_noise(sensor_record(sensor), seed, len(golden))
    np.testing.assert_array_equal(ours, golden)


import functools


@functools.lru_cache(maxsize=None)
def _stream_fn(sensor, n):
    params = load_sensor_params(sensor, dtype=np.float64)
    st = sensor_sample_time(sensor)

    @jax.jit
    def run(key):
        def body(carry, i):
            e, lattice, seg, nxt = carry
            val, carry = noise_next(params, st, e, lattice, seg, nxt, i, key)
            return carry, val

        carry = noise_lattice_init(params, key, dtype=jnp.float64)
        _, vals = jax.lax.scan(body, carry, jnp.arange(n))
        return vals

    return run, st, params


def _native_stream(sensor, key, n, dtype=jnp.float64):
    run, st, params = _stream_fn(sensor, n)
    return np.asarray(run(key)), st, params


def test_native_noise_interpolates_lattice():
    """At 15-min lattice nodes the native stream equals the Johnson-
    transformed AR(1) lattice exactly (the reference's spline interpolates
    nodes too, so the two paths agree exactly there)."""
    key = jax.random.PRNGKey(0)
    vals, st, params = _native_stream("Dexcom", key, 200)

    # host-side replay of the lattice stream
    @jax.jit
    def draws(key):
        return jnp.stack(
            [
                jax.random.normal(jax.random.fold_in(key, j), dtype=jnp.float64)
                for j in range(45)
            ]
        )

    z = np.asarray(draws(key))
    pacf = float(params.PACF)
    e = z[0]
    lattice = [e]
    for j in range(1, 45):
        e = pacf * (e + z[j])
        lattice.append(e)
    eps = np.asarray(
        johnson_transform_su(params, jnp.asarray(lattice, jnp.float64))
    )
    for n in range(len(vals)):
        tau = (n + 1) * st
        if tau % MDL_SAMPLE_TIME == 0:
            k = tau // MDL_SAMPLE_TIME
            assert vals[n] == pytest.approx(eps[k], rel=1e-12), (n, k)


def test_native_noise_statistics():
    """Marginal/temporal law sanity: same AR(1)+Johnson family as the
    reference (noise values at lattice nodes are Johnson-SU of an AR(0.7)
    chain)."""
    keys = jax.random.split(jax.random.PRNGKey(42), 64)
    run, _, _ = _stream_fn("Navigator", 600)
    all_vals = np.asarray(jax.vmap(run)(keys))  # Navigator: 1-min samples
    node_vals = all_vals[:, 14::15]  # values at lattice nodes
    # Reference stationary lattice law: e ~ AR(1) with var -> pacf^2/(1-pacf^2)*...
    # just check gross stats against a big host-side simulation of the law
    rs = np.random.RandomState(7)
    sim = []
    for _ in range(2000):
        e = rs.randn()
        chain = []
        for _ in range(40):
            e = 0.7 * (e + rs.randn())
            chain.append(e)
        sim.extend(chain[5:])
    rec = sensor_record("Navigator")
    sim_eps = rec["xi"] + rec["lambda"] * np.sinh(
        (np.asarray(sim) - rec["gamma"]) / rec["delta"]
    )
    assert abs(node_vals.mean() - sim_eps.mean()) < 1.0
    assert 0.5 < node_vals.std() / sim_eps.std() < 1.5
