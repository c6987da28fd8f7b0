"""On-chip sweep of the blocked-scan chunk length M for the IIR affine
filter (models/iir.py _affine_filter parallel path).

Round-robins M variants inside ONE process so thermal/clock drift hits
all variants equally. Run on the real TPU: `python -u benchmarks/probe_iir_m.py`.
"""
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

hp = jax.lax.Precision.HIGHEST


def combine(lhs, rhs):
    Al, bl = lhs
    Ar, br = rhs
    return (jnp.matmul(Ar, Al, precision=hp),
            jnp.einsum('...ij,...j->...i', Ar, bl, precision=hp) + br)


@partial(jax.jit, static_argnames=('M',))
def blocked(x, A, c, b0, zi, M):
    bsz, n = x.shape
    m = A.shape[-1]
    K = -(-n // M)
    n_pad = K * M
    xp = jnp.pad(x, ((0, 0), (0, n_pad - n)))
    xs = xp.reshape(bsz, K, M).transpose(2, 0, 1)

    def step(S, xj):
        S_new = (jnp.matmul(S, A.T, precision=hp)
                 + xj[..., None] * c[None, None, :])
        return S_new, S

    S0 = jnp.zeros((bsz, K, m), x.dtype)
    L, s_prev_loc = jax.lax.scan(step, S0, xs)
    Apow = jax.lax.associative_scan(
        lambda p, q: jnp.matmul(q, p, precision=hp),
        jnp.broadcast_to(A, (M,) + A.shape))
    Am = Apow[-1]
    Apow_prev = jnp.concatenate(
        [jnp.eye(m, dtype=x.dtype)[None], Apow[:-1]], axis=0)
    Ms = jnp.broadcast_to(Am, (bsz, K) + A.shape)
    Mk, wk = jax.lax.associative_scan(combine, (Ms, L), axis=1)
    t = jnp.einsum('bkmn,bn->bkm', Mk, zi, precision=hp) + wk
    s_init = jnp.concatenate([zi[:, None, :], t[:, :-1]], axis=1)
    s_prev = s_prev_loc + jnp.einsum('jmn,bkn->jbkm', Apow_prev,
                                     s_init, precision=hp)
    y = (b0 * xs + s_prev[..., 0]).transpose(1, 2, 0).reshape(
        bsz, n_pad)[:, :n]
    zf = t[:, -1]
    return y, zf


def bench(fn, args, iters=5):
    y, _ = fn(*args)
    float(y[0, 0])  # drain
    best = 1e9
    for _ in range(iters):
        t0 = time.perf_counter()
        y, zf = fn(*args)
        float(y[0, 0])
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    import scipy.signal as ss
    rng = np.random.default_rng(0)
    Ms = [64, 128, 256, 512, 1024]
    configs = [(1, 2**22), (8, 2**20)]
    sos = ss.butter(6, 0.12, output='sos')
    m = 2
    A = np.zeros((m, m), np.float32)
    A[:, 0] = -sos[0, 4:6]
    A[0, 1] = 1.0
    c = (sos[0, 1:3] - sos[0, 4:6] * sos[0, 0]).astype(np.float32)
    for bsz, n in configs:
        x = jnp.asarray(rng.standard_normal((bsz, n)).astype(np.float32))
        zi = jnp.zeros((bsz, m), jnp.float32)
        Aj = jnp.asarray(A); cj = jnp.asarray(c); b0 = np.float32(sos[0, 0])
        rows = {M: [] for M in Ms}
        # round-robin: 3 passes over all M values
        for rep in range(3):
            for M in Ms:
                t = bench(blocked, (x, Aj, cj, b0, zi, M), iters=3)
                rows[M].append(t)
        print(f'config {bsz}x2^{int(np.log2(n))} (one section):')
        for M in Ms:
            best = min(rows[M])
            print(f'  M={M:5d}: {best*1e3:8.3f} ms  '
                  f'{bsz*n/best/1e6:8.1f} Msamples/s')


if __name__ == '__main__':
    main()
