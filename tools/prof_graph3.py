"""Config-4 optimizer A/B on the real chip (VERDICT r4 weak 2): the two
round-4 rewrites in pose_graph.optimize, isolated at the exact config-4
shapes (B=256 robots, N=32 nodes, E=128 edges, 10 GN iters):

  A. H/b assembly: one-hot (N,E)@(E,N) MXU contractions vs indexed
     scatter-adds (.at[].add), the form the rewrite replaced.
  B. Normal-equation solve: blocked Cholesky + substitutions vs
     jnp.linalg.solve (the TPU LU expander with its serialized pivoting
     While loop).

Timings are dependency-chained (x = f(x)) because independent repeats are
overlapped by the axon backend (docs/PERF.md methodology note).

Run: PYTHONPATH=/root/repo python tools/prof_graph3.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from slam_tpu.ops import linalg

B, N, E, ITERS = 256, 32, 128, 10
rng = np.random.RandomState(0)
i_idx = jnp.asarray(rng.randint(0, N, (B, E)), jnp.int32)
j_idx = jnp.asarray(rng.randint(0, N, (B, E)), jnp.int32)
A_blk = jnp.asarray(rng.randn(B, E, 3, 3).astype(np.float32))
B_blk = jnp.asarray(rng.randn(B, E, 3, 3).astype(np.float32))
Om = jnp.broadcast_to(jnp.eye(3), (B, E, 3, 3)) * 2.0
e_res = jnp.asarray(rng.randn(B, E, 3).astype(np.float32))


def chain(fn, x0, reps=10, label=""):
    f = jax.jit(fn)
    x = f(x0)
    jax.block_until_ready(jax.tree.leaves(x)[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        x = f(x)
    jax.block_until_ready(jax.tree.leaves(x)[0])
    dt = (time.perf_counter() - t0) / reps
    print(f"{label}: {dt*1000:8.2f} ms/call (B={B}, {ITERS} iters)")
    return x


def assemble_onehot(ii, jj, Ab, Bb, om, e):
    Si = jax.nn.one_hot(ii, N, dtype=jnp.float32)
    Sj = jax.nn.one_hot(jj, N, dtype=jnp.float32)
    AtO = jnp.einsum("reba,rebc->reac", Ab, om)
    BtO = jnp.einsum("reba,rebc->reac", Bb, om)

    def blk(Sx, P, Sy):
        return jnp.einsum("rem,reab,ren->rmanb", Sx, P, Sy)

    H = (blk(Si, jnp.einsum("reab,rebc->reac", AtO, Ab), Si)
         + blk(Si, jnp.einsum("reab,rebc->reac", AtO, Bb), Sj)
         + blk(Sj, jnp.einsum("reab,rebc->reac", BtO, Ab), Si)
         + blk(Sj, jnp.einsum("reab,rebc->reac", BtO, Bb), Sj))
    b = (jnp.einsum("rem,rea->rma", Si,
                    jnp.einsum("reab,reb->rea", AtO, e))
         + jnp.einsum("rem,rea->rma", Sj,
                      jnp.einsum("reab,reb->rea", BtO, e)))
    return H.reshape(B, 3 * N, 3 * N), b.reshape(B, 3 * N)


def assemble_scatter(ii, jj, Ab, Bb, om, e):
    AtO = jnp.einsum("reba,rebc->reac", Ab, om)
    BtO = jnp.einsum("reba,rebc->reac", Bb, om)
    Haa = jnp.einsum("reab,rebc->reac", AtO, Ab)
    Hab = jnp.einsum("reab,rebc->reac", AtO, Bb)
    Hba = jnp.einsum("reab,rebc->reac", BtO, Ab)
    Hbb = jnp.einsum("reab,rebc->reac", BtO, Bb)
    ba = jnp.einsum("reab,reb->rea", AtO, e)
    bb = jnp.einsum("reab,reb->rea", BtO, e)

    def one(ii1, jj1, Haa1, Hab1, Hba1, Hbb1, ba1, bb1):
        H = jnp.zeros((N, N, 3, 3))
        H = H.at[ii1, ii1].add(Haa1)
        H = H.at[ii1, jj1].add(Hab1)
        H = H.at[jj1, ii1].add(Hba1)
        H = H.at[jj1, jj1].add(Hbb1)
        b = jnp.zeros((N, 3))
        b = b.at[ii1].add(ba1)
        b = b.at[jj1].add(bb1)
        return (H.transpose(0, 2, 1, 3).reshape(3 * N, 3 * N),
                b.reshape(3 * N))

    return jax.vmap(one)(ii, jj, Haa, Hab, Hba, Hbb, ba, bb)


def run_gn(assemble, solver):
    def step(e):
        def it(ee, _):
            H, b = assemble(i_idx, j_idx, A_blk, B_blk, Om, ee)
            Hd = H + jnp.eye(3 * N) * 1.0
            if solver == "chol":
                def slv(H1, b1):
                    L = linalg.cholesky_blocked(H1)
                    return linalg.back_substitute_blocked(
                        L, linalg.forward_substitute_blocked(
                            L, -b1[:, None]))[:, 0]
                dx = jax.vmap(slv)(Hd, b)
            else:
                dx = jnp.linalg.solve(Hd, -b[..., None])[..., 0]
            return ee + 1e-6 * dx.reshape(B, N, 3)[:, i_idx[0] % N, :3] \
                .reshape(B, E, 3)[:, :, :3], None
        ee, _ = jax.lax.scan(it, e, None, length=ITERS)
        return ee
    return step


for asm_name, asm in (("one-hot", assemble_onehot),
                      ("scatter", assemble_scatter)):
    for sol in ("chol", "lu"):
        chain(run_gn(asm, sol), e_res, reps=5,
              label=f"assembly={asm_name:7s} solver={sol:4s}")
