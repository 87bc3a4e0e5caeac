import sys, time
import numpy as np, jax, jax.numpy as jnp
from mkhe_tpu.ops.ring import Ring
from mkhe_tpu.ops.primes import ntt_primes
from mkhe_tpu.ops import ntt_pallas

logn = int(sys.argv[1]); L = int(sys.argv[2]); B = int(sys.argv[3])
n = 1 << logn
ring = Ring.create(ntt_primes(logn, 27.3, L), logn)
x = jnp.asarray(np.random.randint(0, 1<<27, (B, L, n), dtype=np.uint32))

y1 = ntt_pallas.ntt_batched(ring, x); _ = int(y1[0,0,0])
y2 = jax.jit(ring.ntt)(x)
print("fwd match:", bool(jnp.all(y1 == y2)), flush=True)
z1 = ntt_pallas.ntt_batched(ring, y1, inverse=True); _ = int(z1[0,0,0])
print("inv roundtrip:", bool(jnp.all(z1 == x)), flush=True)

fj = jax.jit(ring.ntt)
def timeit(f, tag, iters=20):
    z = x
    t0=time.time()
    for _ in range(iters): z = f(z)
    _ = int(z[0,0,0])
    dt = (time.time()-t0)/iters
    print(f"{tag}: {dt*1e3:.3f} ms/iter = {dt/ (B*L)*1e6:.1f} us/limb-ntt", flush=True)
timeit(lambda v: ntt_pallas.ntt_batched(ring, v), "pallas fwd")
timeit(fj, "jnp    fwd")
