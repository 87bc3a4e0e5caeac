import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def kern(x_ref, o1, o2, o3):
    a = x_ref[:]
    o1[:] = pltpu.roll(a, 1, 1)
    o2[:] = pltpu.roll(a, a.shape[1] - 1, 1)
    o3[:] = pltpu.repeat(a[:, :2], a.shape[1] // 2, axis=1)

n = 256
x = jnp.arange(8 * n, dtype=jnp.uint32).reshape(8, n)
o = pl.pallas_call(kern,
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
    out_specs=tuple(pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(3)),
    out_shape=tuple(jax.ShapeDtypeStruct((8, n), jnp.uint32) for _ in range(3)))(x)
print("roll(+1):", np.asarray(o[0])[0, :5], "...expect a[j-1] if np-like -> [255,0,1,2,3]")
print("roll(n-1):", np.asarray(o[1])[0, :5], "...expect a[j+1] -> [1,2,3,4,5]")
print("repeat first2:", np.asarray(o[2])[0, :6], np.asarray(o[2])[0, n//2:n//2+3])
