"""In-kernel Poisson demand sampling (fully-fused NetInvMgmt episode kernel).

The sampler is exact CDF inversion: demand = #{k : F(k) <= u} against a
per-retail-link table computed in float64 at trace time (lambda is static
topology data). These tests pin the host-side table and the inversion math
on CPU; the hardware-PRNG end-to-end pinning (dumped streams reproduce the
fused kernel's returns through the pre-materialized kernel AND the XLA step
chain) runs inside bench.py's cross-check on every TPU bench invocation and
in the TPU-gated test below.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from or_gym_inventory_tpu.envs import net_inv_management as net
from or_gym_inventory_tpu.ops import pallas_net_step as pns


def _f64_cdf(lam, n):
    k = np.arange(n)
    # iterative pmf in f64 (same recurrence the table builder uses)
    pmf = np.zeros(n)
    pmf[0] = np.exp(-lam)
    for i in range(1, n):
        pmf[i] = pmf[i - 1] * lam / i
    return np.cumsum(pmf)


@pytest.mark.parametrize("lam", [0.5, 5.0, 20.0, 87.0, 300.0])
def test_poisson_cdf_table_matches_f64(lam):
    table = np.asarray(pns._poisson_cdf_table(lam))
    want = _f64_cdf(lam, len(table))
    np.testing.assert_allclose(table, want.astype(np.float32), rtol=0,
                               atol=0)  # table IS the f32 rounding of f64
    # truncated below the 24-bit uniform's resolution
    assert 1.0 - want[-1] <= 2.0 ** -24
    assert np.all(np.diff(table) >= 0)


def test_poisson_cdf_table_zero_lam():
    assert pns._poisson_cdf_table(0.0) == (float("inf"),)


def test_invert_poisson_matches_searchsorted():
    lam = 20.0
    table = pns._poisson_cdf_table(lam)
    tarr = np.asarray(table, np.float32)
    rng = np.random.default_rng(0)
    u = (rng.integers(0, 1 << 24, size=4096) * 2.0 ** -24).astype(np.float32)
    got = np.asarray(pns._invert_poisson(jnp.asarray(u), table))
    # demand = #{k : F(k) <= u} == index of first table entry > u
    want = np.searchsorted(tarr, u, side="right").astype(np.float32)
    np.testing.assert_array_equal(got, want)


def test_invert_poisson_is_exact_inversion_pmf():
    """Measure of u mapping to each k equals the pmf at the 24-bit uniform's
    resolution: the count of representable u values landing on k is
    (F(k)-F(k-1)) * 2^24 up to f32 rounding of the thresholds."""
    lam = 5.0
    table_f32 = np.asarray(pns._poisson_cdf_table(lam), np.float32)
    # thresholds in units of 2^-24 (u >= F  <=>  u24 >= ceil(F * 2^24)),
    # using the f32 thresholds the kernel actually compares against
    t24 = np.ceil(table_f32.astype(np.float64) * (1 << 24)).astype(np.int64)
    counts = np.diff(np.concatenate([[0], np.minimum(t24, 1 << 24),
                                     [1 << 24]]))
    pmf = np.diff(np.concatenate(
        [[0.0], _f64_cdf(lam, len(table_f32)), [1.0]]))
    np.testing.assert_allclose(counts / float(1 << 24), pmf, atol=2.0 ** -22)


def test_nonpoisson_topology_raises():
    import dataclasses

    from or_gym_inventory_tpu.envs import topology as topo
    T = topo.default_topology(10)
    T2 = dataclasses.replace(T, rt_demand=(("user", (1.0,) * 10),))
    with pytest.raises(NotImplementedError):
        pns._topology_cdf_tables(T2)


class TestDiscreteCdfTable:
    """ops/distributions.discrete_cdf_table — the generic inversion tables
    behind the fused InvManagement kernel (all four stochastic dist modes
    have static params: inventory_management.py:169-184)."""

    def test_poisson_matches_net_table(self):
        from or_gym_inventory_tpu.ops import distributions as dist
        base, table = dist.discrete_cdf_table(dist.POISSON, {"mu": 20.0})
        assert base == 0
        np.testing.assert_array_equal(
            np.asarray(table), np.asarray(pns._poisson_cdf_table(20.0)))

    def test_binomial_exact(self):
        from math import comb

        from or_gym_inventory_tpu.ops import distributions as dist
        n, p = 40, 0.3
        base, table = dist.discrete_cdf_table(dist.BINOMIAL,
                                              {"n": n, "p": p})
        assert base == 0
        want = np.cumsum([comb(n, k) * p ** k * (1 - p) ** (n - k)
                          for k in range(n + 1)])
        got = np.asarray(table, np.float64)
        np.testing.assert_allclose(got, want[: len(table)], rtol=2e-6)
        assert 1.0 - want[len(table) - 1] <= 2.0 ** -24 or \
            len(table) == n + 1

    def test_binomial_degenerate(self):
        from or_gym_inventory_tpu.ops import distributions as dist
        assert dist.discrete_cdf_table(dist.BINOMIAL,
                                       {"n": 7, "p": 1.0}) == (7, ())
        assert dist.discrete_cdf_table(dist.BINOMIAL,
                                       {"n": 7, "p": 0.0}) == (0, ())

    def test_randint_uniform(self):
        from or_gym_inventory_tpu.ops import distributions as dist
        base, table = dist.discrete_cdf_table(dist.RANDINT,
                                              {"low": 3, "high": 10})
        assert base == 3 and len(table) == 7
        # inversion of an exhaustive uniform grid hits each value equally
        u = (np.arange(1 << 12) / float(1 << 12)).astype(np.float32)
        d = base + np.searchsorted(np.asarray(table, np.float32), u, "right")
        counts = np.bincount(d - 3, minlength=8)
        assert counts.min() == counts.max() == (1 << 12) // 8

    def test_geometric_support_starts_at_one(self):
        from or_gym_inventory_tpu.ops import distributions as dist
        p = 0.25
        base, table = dist.discrete_cdf_table(dist.GEOMETRIC, {"p": p})
        assert base == 1
        want = 1.0 - (1.0 - p) ** np.arange(1, len(table) + 1)
        np.testing.assert_allclose(np.asarray(table, np.float64), want,
                                   rtol=2e-6)

    def test_user_mode_raises(self):
        from or_gym_inventory_tpu.ops import distributions as dist
        with pytest.raises(ValueError):
            dist.discrete_cdf_table(dist.USER, {})


@pytest.mark.tpu
@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="hardware PRNG needed (no interpret lowering)")
def test_im_fused_kernel_pinned_by_dumped_streams():
    from or_gym_inventory_tpu.envs import inv_management as im
    from or_gym_inventory_tpu.ops import pallas_episode_kernels as pek
    params = im.default_params(periods=12)
    seed = jnp.asarray(11, jnp.int32)
    B = 1024
    acts, dems = pek.sample_streams_debug_im(params, seed, B, block=1024)
    fused = np.asarray(pek.episode_returns_im_fused(params, seed, B,
                                                    block=1024))
    pre = np.asarray(pek.episode_returns_im(params, acts, dems, block=512))
    np.testing.assert_allclose(fused, pre, rtol=1e-5, atol=1e-3)


@pytest.mark.tpu
@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="hardware PRNG needed (no interpret lowering)")
def test_im_fused_kernel_interleaved_episodes_pinned():
    """episodes_per_lane=2 on the InvManagement fused kernel: each
    interleaved episode reproduces through the pre-materialized kernel on
    the widened dumped streams (same pinning pattern as the NetInvMgmt
    interleave test below)."""
    from or_gym_inventory_tpu.envs import inv_management as im
    from or_gym_inventory_tpu.ops import pallas_episode_kernels as pek
    params = im.default_params(periods=12)
    seed = jnp.asarray(13, jnp.int32)
    B, E = 1024, 2
    acts, dems = pek.sample_streams_debug_im(params, seed, B, block=1024,
                                             episodes_per_lane=E)
    fused = np.asarray(pek.episode_returns_im_fused(params, seed, B,
                                                    block=1024,
                                                    episodes_per_lane=E))
    assert fused.shape == (E, B)
    for e in range(E):
        pre = np.asarray(pek.episode_returns_im(params, acts[:, e],
                                                dems[:, e], block=512))
        np.testing.assert_allclose(fused[e], pre, rtol=1e-5, atol=1e-3)
    assert np.abs(fused[0] - fused[1]).max() > 0


@pytest.mark.tpu
@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="hardware PRNG needed (no interpret lowering)")
def test_fused_kernel_pinned_by_dumped_streams():
    params = net.default_params(num_periods=10)
    hi = float(params.topology.order_cap_heuristic * 2)
    seed = jnp.asarray(7, jnp.int32)
    B = 1024
    acts, dems = pns.sample_streams_debug(params, seed, hi, B, block=1024)
    fused = np.asarray(pns.episode_returns_fully_fused(
        params, seed, hi, B, block=1024))
    pre = np.asarray(pns.episode_returns(params, acts, dems, block=512))
    np.testing.assert_allclose(fused, pre, rtol=1e-5, atol=1e-3)


@pytest.mark.tpu
@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="hardware PRNG needed (no interpret lowering)")
def test_fused_kernel_interleaved_episodes_pinned():
    """episodes_per_lane=2: each interleaved episode reproduces through the
    pre-materialized kernel on the widened dumped streams."""
    params = net.default_params(num_periods=8)
    hi = float(params.topology.order_cap_heuristic * 2)
    seed = jnp.asarray(21, jnp.int32)
    B, E = 1024, 2
    acts, dems = pns.sample_streams_debug(params, seed, hi, B, block=1024,
                                          episodes_per_lane=E)
    fused = np.asarray(pns.episode_returns_fully_fused(
        params, seed, hi, B, block=1024, episodes_per_lane=E))
    assert fused.shape == (E, B)
    for e in range(E):
        pre = np.asarray(pns.episode_returns(params, acts[:, e], dems[:, e],
                                             block=512))
        np.testing.assert_allclose(fused[e], pre, rtol=1e-5, atol=1e-3)
    # independent episodes: not identical across e
    assert np.abs(fused[0] - fused[1]).max() > 0


@pytest.mark.tpu
@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="hardware PRNG needed (no interpret lowering)")
def test_nv_fused_kernel_pinned_by_dumped_streams():
    """The fully-fused Newsvendor kernel (in-kernel dynamic-mu Poisson
    inversion) reproduces through the pre-materialized-stream kernel on its
    own dumped streams, and the dumped demand stream tracks the per-lane
    Poisson mean."""
    from or_gym_inventory_tpu.envs import newsvendor as nv
    from or_gym_inventory_tpu.ops import pallas_episode_kernels as pek
    params = nv.default_params(step_limit=12)
    B = 1024
    econ = jax.vmap(lambda k: nv.draw_econ(params, k), out_axes=1)(
        jax.random.split(jax.random.PRNGKey(5), B))
    seed = jnp.asarray(13, jnp.int32)
    acts, dems = pek.sample_streams_debug_nv(params, econ, seed, block=1024)
    fused = np.asarray(pek.episode_returns_nv_fused(params, econ, seed,
                                                    block=1024))
    pre = np.asarray(pek.episode_returns_nv(params, econ, acts, dems,
                                            block=512))
    np.testing.assert_allclose(fused, pre, rtol=1e-5, atol=1e-3)
    # demand stream is Poisson(mu_lane): per-lane mean tracks econ[4]
    mu = np.asarray(econ[4])
    lane_mean = np.asarray(dems).mean(axis=0)
    resid = lane_mean - mu
    # 12 samples/lane: se = sqrt(mu/12); allow 6 sigma across 1024 lanes
    assert (np.abs(resid) <= 6 * np.sqrt(np.maximum(mu, 1e-3) / 12) + 1e-2
            ).mean() > 0.999
