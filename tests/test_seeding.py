"""gym-0.9.4 seeding chain parity (reference tests/test_seed.py contract)."""
import pytest

from simglucose_tpu.compat.seeding import gym_seed_chain, hash_seed, np_random


def test_hash_seed_deterministic():
    assert hash_seed(0) == hash_seed(0)
    assert hash_seed(0) != hash_seed(1)


def test_seed_start_hour_contract():
    """Reference tests/test_seed.py:17-23: env.seed(0); env.reset() must land
    on start_time 2018-01-01 23:00:00, and seed 1000 on 14:00:00.  Both
    seed() and reset() run _create_env_from_random_state
    (simglucose_gym_env.py:49,55), so the asserted hour is the SECOND chain
    drawn from the re-seeded RandomState."""
    for seed, expect_hour in [(0, 23), (1000, 14)]:
        rng, seed1 = np_random(seed)
        assert seed1 == seed
        gym_seed_chain(rng)  # consumed by env.seed()
        seed2, seed3, seed4, hour = gym_seed_chain(rng)  # env.reset()
        assert hour == expect_hour
        # seeds stay below 2**31 (simglucose_gym_env.py:59-64)
        for s in (seed2, seed3, seed4):
            assert 0 <= s < 2**31


def test_chain_reproducible_and_seed_sensitive():
    rng_a, _ = np_random(7)
    rng_b, _ = np_random(7)
    assert gym_seed_chain(rng_a) == gym_seed_chain(rng_b)
    rng_c, _ = np_random(8)
    assert gym_seed_chain(rng_a) != gym_seed_chain(rng_c)
