"""Streaming elementwise kernel (ops/pallas_map.py) in interpret mode.

Chunk sizes are monkeypatched small so every code path (even/odd chunk
counts, remainder tile, scalar SMEM operands, multi-output) runs on tiny
arrays; the same code runs compiled on TPU via the dsc op layer."""

import numpy as np
import pytest

import dsc_tpu.ops.pallas_map as pm

from conftest import all_close


@pytest.fixture(autouse=True)
def small_chunks(monkeypatch):
    monkeypatch.setattr(pm, 'MODE', 'on')
    monkeypatch.setattr(pm, 'CHUNK_ROWS', 64)
    monkeypatch.setattr(pm, 'MIN_ELEMS', 1024)
    yield


def _rand(ne):
    return np.random.default_rng(ne).standard_normal(ne).astype(np.float32)


@pytest.mark.parametrize(
    'ne',
    [
        64 * 128 * 2,        # even chunk count, no remainder
        64 * 128 * 3,        # odd chunk count
        64 * 128 * 2 + 1024, # remainder tile
        64 * 128 * 5 + 2048, # odd + remainder
        1024,                # single (remainder-only) tile
    ],
)
def test_stream_map_shapes(ne):
    import jax.numpy as jnp

    a, b = _rand(ne), _rand(ne + 1)[1:]
    assert pm.eligible((a.shape, b.shape), (a.dtype, b.dtype))
    got = np.asarray(pm.stream_map(jnp.add, a, b))
    assert all_close(got, a + b)


def test_stream_map_scalar_operand():
    import jax.numpy as jnp

    ne = 64 * 128 * 3 + 1024
    a = _rand(ne)
    s = np.float32(2.5)
    assert pm.eligible((a.shape, ()), (a.dtype, np.float32))
    got = np.asarray(pm.stream_map(jnp.multiply, a, s))
    assert all_close(got, a * np.float32(2.5))
    # reversed orientation (scalar first)
    got = np.asarray(pm.stream_map(jnp.subtract, s, a))
    assert all_close(got, np.float32(2.5) - a)


def test_stream_map_multi_output():
    ne = 64 * 128 * 2 + 2048
    ar, ai, br, bi = (_rand(ne + k)[k:] for k in range(4))

    def cmul(xr, xi, yr, yi):
        return xr * yr - xi * yi, xr * yi + xi * yr

    gr, gi = pm.stream_map_multi(
        cmul, (ar, ai, br, bi), (np.float32, np.float32)
    )
    want = (ar + 1j * ai) * (br + 1j * bi)
    assert all_close(np.asarray(gr), want.real)
    assert all_close(np.asarray(gi), want.imag)


@pytest.mark.parametrize('shape,rshape', [
    ((16, 1024), (1, 1024)),     # aligned rows, tile multiple
    ((16, 1024), (1024,)),       # 1-D row operand
    ((17, 1024), (1, 1024)),     # remainder tile with brow
    ((6, 2048), (1, 2048)),      # brow_tiles == 16 == CHUNK_ROWS/4
])
def test_stream_map_broadcast_row(shape, rshape):
    import jax.numpy as jnp

    rng = np.random.default_rng(3)
    a = rng.standard_normal(shape).astype(np.float32)
    r = rng.standard_normal(rshape).astype(np.float32)
    assert pm.eligible((a.shape, r.shape), (a.dtype, r.dtype))
    got = np.asarray(pm.stream_map(jnp.add, a, r))
    assert all_close(got, a + r)
    # reversed operand order too
    got2 = np.asarray(pm.stream_map(jnp.subtract, r, a))
    assert all_close(got2, r - a)


@pytest.mark.parametrize('impl', ['vrep', 'b3d', 'bcast', 'concat', 'repeat'])
def test_stream_map_brow_impls(impl, monkeypatch):
    # every replication strategy (DSC_MAP_BROW_IMPL) must agree; the
    # default is chosen by on-chip A/B (benchmarks/probe_brow.py)
    import jax.numpy as jnp

    monkeypatch.setattr(pm, 'BROW_IMPL', impl)
    rng = np.random.default_rng(impl.encode()[0])
    a = rng.standard_normal((100, 384)).astype(np.float32)  # brow_tiles=3
    r = rng.standard_normal((1, 384)).astype(np.float32)
    got = np.asarray(pm.stream_map(jnp.add, a, r))
    assert all_close(got, a + r)


def test_stream_map_brow_and_scalar():
    import jax.numpy as jnp

    rng = np.random.default_rng(4)
    a = rng.standard_normal((32, 512)).astype(np.float32)
    r = rng.standard_normal((1, 512)).astype(np.float32)
    got = np.asarray(pm.stream_map(
        lambda x, y, s: x * y + s, a, r, np.float32(2.5)))
    assert all_close(got, a * r + 2.5)


def test_brow_eligibility_rules():
    f32 = np.float32
    ok = (8, 1024)
    assert pm.eligible((ok, (1, 1024)), (f32, f32))
    assert pm.eligible((ok, (1024,)), (f32, f32))
    # unaligned row length -> XLA path
    assert not pm.eligible(((60, 60000), (1, 60000)), (f32, f32))
    # column broadcast -> XLA path
    assert not pm.eligible((ok, (ok[0], 1)), (f32, f32))
    # row longer than CHUNK_ROWS*128 -> XLA path
    big_m = (pm.CHUNK_ROWS + 1) * 128
    assert not pm.eligible(((8, big_m), (1, big_m)), (f32, f32))


def test_eligibility_rules():
    big = (pm.MIN_ELEMS,)
    f32 = np.float32
    assert pm.eligible((big, big), (f32, f32))
    assert pm.eligible((big, (1,)), (f32, f32))          # scalar operand
    assert pm.eligible(((1,), big), (f32, f32))
    assert not pm.eligible(((1,), (1,)), (f32, f32))     # no streamed side
    assert not pm.eligible((big, (512,)), (f32, f32))    # shape mismatch
    assert not pm.eligible(((1000,), (1000,)), (f32, f32))  # below minimum
    assert not pm.eligible((big, big), (np.float64, np.float64))
    odd = (pm.MIN_ELEMS + 100,)
    assert not pm.eligible((odd, odd), (f32, f32))       # not /1024


# -- dsc.map: user-fused elementwise chains in one streaming pass ------------


def test_dsc_map_chain_stream():
    """A 3-op chain through dsc.map equals the eager op chain and runs as
    ONE streaming program."""
    import dsc_tpu as dsc

    ne = 64 * 128 * 3 + 2048
    a = _rand(ne)
    b = _rand(ne + 1)[1:]
    ad, bd = dsc.from_numpy(a), dsc.from_numpy(b)

    fused = dsc.map(lambda x, y: dsc.clip(x * y + 0.5, -1.0, 1.0))
    got = fused(ad, bd)
    want = np.clip(a * b + 0.5, -1.0, 1.0)
    assert all_close(got.numpy(), want)
    assert fused.n_programs == 1
    assert fused._programs[next(iter(fused._programs))][0] == 'stream'
    # second call reuses the cached program
    got2 = fused(ad, bd)
    assert fused.n_programs == 1
    assert all_close(got2.numpy(), want)


def test_dsc_map_scalar_and_brow_operands():
    """1-element and broadcast-row operands stream with the chain."""
    import dsc_tpu as dsc

    rows, m = 48, 1024
    x = _rand(rows * m).reshape(rows, m)
    row = _rand(m)
    s = np.float32(0.25)
    xd = dsc.from_numpy(x)
    rowd = dsc.from_numpy(row)
    sd = dsc.from_numpy(np.array([s]))

    fused = dsc.map(lambda t, r, k: t * r + k)
    got = fused(xd, rowd, sd)
    assert all_close(got.numpy(), x * row + s)
    assert fused._programs[next(iter(fused._programs))][0] == 'stream'


def test_dsc_map_multi_output():
    import dsc_tpu as dsc

    ne = 64 * 128 * 2
    a, b = _rand(ne), _rand(ne + 1)[1:]
    fused = dsc.map(lambda x, y: (x + y, x * y))
    g1, g2 = fused(dsc.from_numpy(a), dsc.from_numpy(b))
    assert all_close(g1.numpy(), a + b)
    assert all_close(g2.numpy(), a * b)


def test_dsc_map_fallback():
    """Non-streamable signatures (f64, non-elementwise fn) fall back to
    one fused XLA program with identical results."""
    import dsc_tpu as dsc

    a = np.random.default_rng(1).standard_normal(4096)  # f64
    fused = dsc.map(lambda x: x * 2.0 + 1.0)
    got = fused(dsc.from_numpy(a))
    assert all_close(got.numpy(), a * 2.0 + 1.0)
    assert fused._programs[next(iter(fused._programs))][0] == 'xla'

    # a reduction is not elementwise: output shape validation rejects it
    af = _rand(64 * 128 * 2)
    red = dsc.map(lambda x: dsc.sum(x, axis=-1, keepdims=True))
    got2 = red(dsc.from_numpy(af))
    assert all_close(got2.numpy(), af.sum(keepdims=True))
    assert red._programs[next(iter(red._programs))][0] == 'xla'


def test_dsc_map_immediate_form():
    import dsc_tpu as dsc

    a = _rand(64 * 128 * 2)
    got = dsc.map(lambda x: dsc.sqrt(dsc.absolute(x)), dsc.from_numpy(a))
    assert all_close(got.numpy(), np.sqrt(np.abs(a)))


def test_dsc_map_under_compile():
    """A dsc.map wrapper composes inside a dsc.compile pipeline: the
    streaming kernel traces into the outer program."""
    import dsc_tpu as dsc

    ne = 64 * 128 * 2
    a, b = _rand(ne), _rand(ne + 1)[1:]
    fused = dsc.map(lambda x, y: dsc.clip(x * y + 0.5, -1.0, 1.0))

    @dsc.compile
    def pipe(x, y):
        return fused(x, y) * 2.0

    got = pipe(dsc.from_numpy(a), dsc.from_numpy(b)).numpy()
    assert all_close(got, np.clip(a * b + 0.5, -1.0, 1.0) * 2.0)
    assert next(iter(fused._programs.values()))[0] == 'stream'
