import sys, time
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from mkhe_tpu.ops.ring import Ring
from mkhe_tpu.ops.primes import ntt_primes
from mkhe_tpu.ops import modmath as mm

logn = int(sys.argv[1]) if len(sys.argv) > 1 else 12
n = 1 << logn
ring = Ring.create(ntt_primes(logn, 27.3, 8), logn)
L = ring.nlimbs

def kernel(x_ref, psi_ref, psi_sh_ref, q_ref, out_ref):
    a = x_ref[0]              # (8, n)
    q = q_ref[:]              # (8, 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (8, n), 1)
    m = 1; t = n
    while m < n:
        t //= 2
        tw = pltpu.repeat(psi_ref[:, m:2*m], 2*t, axis=1)       # (8, n)
        tw_sh = pltpu.repeat(psi_sh_ref[:, m:2*m], 2*t, axis=1)
        p = pltpu.roll(a, n - t, 1)
        mneg = pltpu.roll(a, t, 1)
        first = (lane & t) == 0
        V = jnp.where(first, p, a)
        U = jnp.where(first, a, mneg)
        SV = mm.shoup_mul(V, tw, tw_sh, q)
        a = jnp.where(first, mm.add_mod(U, SV, q), mm.sub_mod(U, SV, q))
        m *= 2
    out_ref[0] = a

@jax.jit
def pallas_ntt(x):
    B = x.shape[0]
    return pl.pallas_call(
        kernel,
        grid=(B, L // 8),
        in_specs=[pl.BlockSpec((1, 8, n), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
                  pl.BlockSpec((8, n), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
                  pl.BlockSpec((8, n), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
                  pl.BlockSpec((8, 1), lambda i, j: (j, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 8, n), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
    )(x, ring.psi, ring.psi_sh, ring.q[:, None])

x = jnp.asarray(np.random.randint(0, 1<<27, (4, L, n), dtype=np.uint32))
t0 = time.time()
y = pallas_ntt(x); _ = int(y[0,0,0])
print("pallas compile+run", time.time()-t0, flush=True)
y2 = jax.jit(ring.ntt)(x)
print("match:", bool(jnp.all(y == y2)), flush=True)
z = x
t0=time.time()
for _ in range(20): z = pallas_ntt(z)
_ = int(z[0,0,0])
print(f"pallas chained 20x (4,{L},2^{logn}):", (time.time()-t0)/20*1000, "ms", flush=True)
f2 = jax.jit(ring.ntt)
z = f2(x); _ = int(z[0,0,0])
t0=time.time()
for _ in range(20): z = f2(z)
_ = int(z[0,0,0])
print(f"jnp    chained 20x (4,{L},2^{logn}):", (time.time()-t0)/20*1000, "ms", flush=True)
