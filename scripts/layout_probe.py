"""Micro-benchmark: batch-FIRST (vmap-style) vs batch-LAST layouts for the
physics hot ops (CRBA-shaped einsum chain + rank-1-update Cholesky solve,
the same algorithm as ops/linalg.cholesky_solve).

Hypothesis: with B minor-most, the env batch maps onto TPU vector lanes and
the small (6 / 27-wide) spatial-algebra dims stop wasting padded tiles.

  python scripts/layout_probe.py [batch]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from steppingstone_tpu.ops.linalg import cholesky_solve  # batch-leading (..., n, n)

B = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
ND = 27
NB = 22
N_ITER = 50
key = jax.random.PRNGKey(0)


def timeit(name, fn, *args):
    t0 = time.perf_counter()
    out = jax.block_until_ready(fn(*args))
    tc = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(N_ITER):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / N_ITER
    print(f"{name:44s} {dt*1e3:8.3f} ms  ({B/dt/1e6:7.2f} M/s)  [compile {tc:.1f}s]")
    return out


def cholesky_solve_blast(A, b):
    """Same rank-1-update algorithm as ops/linalg.cholesky_solve, but with
    layout (n, n, B) / (n, B): batch minor-most."""
    n = A.shape[0]
    cols = []
    for j in range(n):
        d = jax.lax.rsqrt(jnp.maximum(A[j, j], 1e-12))
        col = A[j] * d                                  # (n, B)
        col = col * (np.arange(n) >= j)[:, None]
        cols.append(col)
        A = A - col[:, None, :] * col[None, :, :]
    diag = [cols[j][j] for j in range(n)]

    acc = jnp.zeros_like(b)
    y = []
    for j in range(n):
        yj = (b[j] - acc[j]) / diag[j]
        y.append(yj)
        acc = acc + cols[j] * yj[None, :]

    xv = jnp.zeros_like(b)
    for j in reversed(range(n)):
        s = jnp.sum(cols[j] * xv, axis=0)
        xj = (y[j] - s) / diag[j]
        xv = xv.at[j].set(xj)
    return xv


A_np = np.random.randn(B, ND, ND).astype(np.float32)
M_bf = jnp.asarray(A_np @ A_np.transpose(0, 2, 1) + 10 * np.eye(ND, dtype=np.float32))
b_bf = jnp.asarray(np.random.randn(B, ND).astype(np.float32))
M_bl = jnp.transpose(M_bf, (1, 2, 0))
b_bl = jnp.transpose(b_bf, (1, 0))

Ic_bf = jnp.asarray(np.random.randn(B, ND, 6, 6).astype(np.float32))
phi_bf = jnp.asarray(np.random.randn(B, ND, 6).astype(np.float32))
mask = jnp.asarray(np.tril(np.ones((ND, ND), np.float32)))
Ic_bl = jnp.transpose(Ic_bf, (1, 2, 3, 0))
phi_bl = jnp.transpose(phi_bf, (1, 2, 0))


def crba_bf(Ic, phi):
    F = jnp.einsum("Bkab,Bkb->Bka", Ic, phi)
    L = jnp.einsum("Bka,Bla->Bkl", F, phi) * mask
    return L + jnp.swapaxes(L, 1, 2) - L * jnp.eye(ND)


def crba_bl(Ic, phi):
    F = jnp.einsum("kabB,kbB->kaB", Ic, phi)
    L = jnp.einsum("kaB,laB->klB", F, phi) * mask[..., None]
    return L + jnp.swapaxes(L, 0, 1) - L * jnp.eye(ND)[..., None]


print(f"backend={jax.default_backend()} B={B}")
x_bf = timeit("chol solve 27 rank1  batch-first", jax.jit(cholesky_solve), M_bf, b_bf)
x_bl = timeit("chol solve 27 rank1  batch-LAST", jax.jit(cholesky_solve_blast), M_bl, b_bl)
print("  max|diff|", float(jnp.max(jnp.abs(x_bf - x_bl.T))))
m_bf = timeit("CRBA einsum chain    batch-first", jax.jit(crba_bf), Ic_bf, phi_bf)
m_bl = timeit("CRBA einsum chain    batch-LAST", jax.jit(crba_bl), Ic_bl, phi_bl)
print("  max|diff|", float(jnp.max(jnp.abs(m_bf - jnp.transpose(m_bl, (2, 0, 1))))))

f_bf = jax.jit(lambda Ic, phi, b: cholesky_solve(crba_bf(Ic, phi) + 50 * jnp.eye(ND), b))
f_bl = jax.jit(
    lambda Ic, phi, b: cholesky_solve_blast(
        crba_bl(Ic, phi) + 50 * jnp.eye(ND)[..., None], b
    )
)
timeit("CRBA+solve fused     batch-first", f_bf, Ic_bf, phi_bf, b_bf)
timeit("CRBA+solve fused     batch-LAST", f_bl, Ic_bl, phi_bl, b_bl)
