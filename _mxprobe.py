import time, numpy as np, jax, jax.numpy as jnp
def probe(m, k, n, L=1, iters=30):
    W = jnp.asarray(np.random.randint(0, 127, (L, m, k)).astype(np.float32), dtype=jnp.bfloat16)
    A = jnp.asarray(np.random.randint(0, 127, (L, k, n)).astype(np.float32), dtype=jnp.bfloat16)
    f = jax.jit(lambda W, A: jnp.einsum('lmk,lkn->lmn', W, A, preferred_element_type=jnp.float32))
    y = f(W, A); _ = float(y[0,0,0])
    t0 = time.time()
    for _ in range(iters): y = f(W, A)
    _ = float(y[0,0,0])
    dt = (time.time()-t0)/iters
    print(f"L={L} ({m}x{k})@({k}x{n}): {dt*1e3:.3f} ms, {L*m*k*n/dt/1e12:.1f} TMAC/s", flush=True)
probe(4096, 4096, 4096)
probe(1280, 256, 640, L=30)
probe(1536, 256, 768, L=30)
probe(256, 256, 128*4*30)     # merge batch+limb into N? (wrong math but rate probe)
