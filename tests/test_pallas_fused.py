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


def test_topology_link_specs_cover_every_named_spec():
    """Every static-parameter retail spec compiles to an inversion table,
    user/zero bake as per-period constants (the matching uniform row is
    drawn-and-ignored), and only an arbitrary host callable refuses."""
    import dataclasses

    from or_gym_inventory_tpu.envs import topology as topo
    T = topo.default_topology(10)

    def specs_for(rt):
        return pns._topology_link_specs(
            dataclasses.replace(T, rt_demand=(rt,)), 10)

    for rt in (("poisson", 20.0), ("binomial", 40, 0.3),
               ("negbinomial", 5, 0.4), ("randint", 3, 11),
               ("geometric", 0.25), ("normal", 20.0, 4.0)):
        (kind, base, table), = specs_for(rt)
        assert kind == "table" and len(table) >= 1
        assert all(0.0 <= f <= 1.0 for f in table)
        assert list(table) == sorted(table)

    (kind, vals), = specs_for(("user", (3.0, 1.0, 4.0)))
    assert kind == "const" and len(vals) == 10
    assert vals[:3] == (3.0, 1.0, 4.0) and set(vals[3:]) == {4.0}
    (kind, vals), = specs_for(("zero",))
    assert kind == "const" and set(vals) == {0.0}

    with pytest.raises(NotImplementedError):
        specs_for(("hostfn", lambda **kw: 0, ()))


def test_negbinomial_table_survives_pmf0_underflow():
    """pmf(0) = p^n can underflow float64 (n=8000, p=0.9 -> ~1e-366); the
    log-space recurrence still builds a correct table around the bulk of
    the mass (mean n(1-p)/p ~ 889, sd ~ 31 — well inside the cap)."""
    from or_gym_inventory_tpu.ops import distributions as dist
    base, table = dist.cdf_table_for_spec(("negbinomial", 8000, 0.9))
    assert base == 0 and 889 < len(table) < 4096
    t = np.asarray(table, np.float64)
    assert np.all(np.diff(t) >= -1e-12) and 1.0 - t[-1] <= 2.0 ** -24
    med = base + np.searchsorted(t.astype(np.float32), np.float32(0.5),
                                 "right")
    assert abs(med - 889) < 15


def test_wide_distribution_refuses_instead_of_truncating():
    """A distribution whose support exceeds the unroll cap must raise
    NotImplementedError (-> the dispatchers' loud XLA fallback), never
    silently truncate to a wrong law."""
    from or_gym_inventory_tpu.ops import distributions as dist
    with pytest.raises(NotImplementedError):
        dist.discrete_cdf_table(dist.POISSON, {"mu": 50_000.0})
    with pytest.raises(NotImplementedError):
        dist.cdf_table_for_spec(("normal", 100_000.0, 5_000.0))
    # RANDINT builds its table directly (exact-uniform thresholds, no pmf
    # accumulator) — a wide span must take the same loud refusal
    with pytest.raises(NotImplementedError):
        dist.discrete_cdf_table(dist.RANDINT, {"low": 0, "high": 100_000})


def test_link_demand_inversion_matches_host_distributions():
    """_link_demand inversion of an exhaustive uniform grid reproduces each
    distribution's pmf (randint exact-uniform; normal matches Phi; base
    offsets applied)."""
    from or_gym_inventory_tpu.ops import distributions as dist

    # randint numpy-exclusive semantics: values low..high-1 uniformly
    base, table = dist.cdf_table_for_spec(("randint", 2, 6))
    u = jnp.asarray((np.arange(1 << 10) / float(1 << 10)), jnp.float32)
    d = np.asarray(pns._link_demand(("table", base, table), u, 0))
    counts = np.bincount(d.astype(int) - 2, minlength=4)
    assert counts.min() == counts.max() == (1 << 10) // 4
    assert d.min() == 2 and d.max() == 5

    # normal(loc=8, scale=2): inversion frequencies track Phi differences
    base, table = dist.cdf_table_for_spec(("normal", 8.0, 2.0))
    rng = np.random.default_rng(1)
    u = (rng.integers(0, 1 << 24, 1 << 16) * 2.0 ** -24).astype(np.float32)
    d = np.asarray(pns._link_demand(("table", base, table), jnp.asarray(u), 0))
    from math import erf, sqrt
    phi = lambda x: 0.5 * (1 + erf((x - 8.0) / (2.0 * sqrt(2))))
    for k in (5, 8, 11):
        want = phi(k + 0.5) - phi(k - 0.5)
        got = float((d == k).mean())
        assert abs(got - want) < 6 * np.sqrt(want * (1 - want) / (1 << 16))


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
def test_sample_streams_dump_range_slices_match_full_dump():
    """dump_range slices are bit-identical to the corresponding slice of a
    full dump (all streams drawn either way — only the writes are sliced),
    so the bench E=16 cross-check can dump in VMEM-sized ranges."""
    params = net.default_params(num_periods=6)
    hi = float(params.topology.order_cap_heuristic * 2)
    seed = jnp.asarray(61, jnp.int32)
    B, E = 1024, 4
    full_a, full_d = pns.sample_streams_debug(params, seed, hi, B,
                                              block=1024,
                                              episodes_per_lane=E)
    for e0, e1 in ((0, 2), (2, 4), (1, 3)):
        a, d = pns.sample_streams_debug(params, seed, hi, B, block=1024,
                                        episodes_per_lane=E,
                                        dump_range=(e0, e1))
        np.testing.assert_array_equal(np.asarray(a),
                                      np.asarray(full_a[:, e0:e1]))
        np.testing.assert_array_equal(np.asarray(d),
                                      np.asarray(full_d[:, e0:e1]))


@pytest.mark.tpu
@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="hardware PRNG needed (no interpret lowering)")
def test_fused_kernel_nonpoisson_links_pinned_by_dumped_streams():
    """The generalized fused demand path: a binomial retail link and a
    deterministic user-array link both run through the fully-fused kernel
    and reproduce through the pre-materialized kernel AND the XLA step
    chain on the dumped streams (reference per-edge demand surface:
    network_management.py:240-267)."""
    import dataclasses

    for rt in (("binomial", 40, 0.3), ("randint", 5, 26),
               ("user", (12.0, 0.0, 31.0, 7.0))):
        p0 = net.default_params(num_periods=6)
        T2 = dataclasses.replace(p0.topology, rt_demand=(rt,))
        params = p0.replace(topology=T2)
        hi = float(T2.order_cap_heuristic * 2)
        seed = jnp.asarray(29, jnp.int32)
        B = 1024
        acts, dems = pns.sample_streams_debug(params, seed, hi, B, block=1024)
        fused = np.asarray(pns.episode_returns_fully_fused(
            params, seed, hi, B, block=1024))
        pre = np.asarray(pns.episode_returns(params, acts, dems, block=512))
        np.testing.assert_allclose(fused, pre, rtol=1e-5, atol=1e-3,
                                   err_msg=str(rt))
        d = np.asarray(dems)
        if rt[0] == "user":
            # deterministic: every lane sees the baked per-period value
            want = np.asarray(rt[1] + (rt[1][-1],) * 2, np.float32)
            np.testing.assert_array_equal(d[:, 0], np.broadcast_to(
                want[:, None], (6, B)))
        elif rt[0] == "randint":
            assert d.min() >= 5 and d.max() <= 25  # numpy high-exclusive
        else:
            assert 0 <= d.min() and d.max() <= 40
            assert abs(d.mean() - 12.0) < 0.5  # n*p = 12

        # the XLA step chain agrees on the same streams
        def one_env(acts1, dems1):
            state, _ = net.reset(params)

            def body(state, ad):
                a, d = ad
                state, ts = net.step_with_demand(params, state, a, d)
                return state, ts.reward

            _, rew = jax.lax.scan(body, state, (acts1, dems1))
            return jnp.sum(rew)

        x = np.asarray(jax.jit(jax.vmap(one_env, in_axes=(2, 2)))(
            acts[:, :, :256], dems[:, :, :256]))
        np.testing.assert_allclose(pre[:256], x, rtol=1e-4, atol=1e-2,
                                   err_msg=str(rt))


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


@pytest.mark.tpu
@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="hardware PRNG needed (no interpret lowering)")
def test_nv_reset_fused_kernel_pinned_by_dumped_streams():
    """The reset-fused Newsvendor kernel (econ + actions + demand all drawn
    on-core — the production dispatcher's NV path) reproduces through the
    pre-materialized-stream kernel on its own dumped streams, and the dumped
    econ rows satisfy the reset's conditional-uniform constraints
    (newsvendor.py:105-111)."""
    from or_gym_inventory_tpu.envs import newsvendor as nv
    from or_gym_inventory_tpu.ops import pallas_episode_kernels as pek
    params = nv.default_params(step_limit=12)
    B = 1024
    seed = jnp.asarray(17, jnp.int32)
    econ, acts, dems = pek.sample_streams_debug_nv_reset(params, seed, B,
                                                         block=1024)
    fused = np.asarray(pek.episode_returns_nv_reset_fused(params, seed, B,
                                                          block=1024))
    pre = np.asarray(pek.episode_returns_nv(params, econ[0], acts[:, 0],
                                            dems[:, 0], block=512))
    np.testing.assert_allclose(fused, pre, rtol=1e-5, atol=1e-3)
    e = np.asarray(econ[0])
    price, cost, h, k, mu = e
    assert (price >= 1.0).all() and (price <= params.p_max).all()
    assert (cost >= 1.0).all() and (cost <= np.maximum(price, 1.0)).all()
    assert (h <= np.minimum(cost, params.h_max) + 1e-5).all()
    assert (k <= params.k_max).all() and (h >= 0).all() and (k >= 0).all()
    assert (mu >= 0).all() and (mu <= params.mu_max).all()


@pytest.mark.tpu
@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="hardware PRNG needed (no interpret lowering)")
def test_nv_reset_fused_interleaved_episodes_pinned():
    """episodes_per_lane=2 on the reset-fused Newsvendor kernel: each
    interleaved episode (own econ draw) reproduces through the
    pre-materialized kernel on the widened dumped streams."""
    from or_gym_inventory_tpu.envs import newsvendor as nv
    from or_gym_inventory_tpu.ops import pallas_episode_kernels as pek
    params = nv.default_params(step_limit=12)
    B, E = 1024, 2
    seed = jnp.asarray(19, jnp.int32)
    econ, acts, dems = pek.sample_streams_debug_nv_reset(
        params, seed, B, block=1024, episodes_per_lane=E)
    fused = np.asarray(pek.episode_returns_nv_reset_fused(
        params, seed, B, block=1024, episodes_per_lane=E))
    assert fused.shape == (E, B)
    for e in range(E):
        pre = np.asarray(pek.episode_returns_nv(params, econ[e], acts[:, e],
                                                dems[:, e], block=512))
        np.testing.assert_allclose(fused[e], pre, rtol=1e-5, atol=1e-3)
    # independent episodes draw independent econ: returns differ
    assert np.abs(fused[0] - fused[1]).max() > 0
    assert np.abs(np.asarray(econ[0]) - np.asarray(econ[1])).max() > 0
