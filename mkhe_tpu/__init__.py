"""mkhe_tpu: a TPU-native multi-key homomorphic encryption framework.

A from-scratch JAX/XLA/Pallas implementation of the KKLSS multi-key
homomorphic encryption scheme (eprint 2022/347), with the capabilities of the
SNUCP/MKHE-KKLSS Go reference (multi-key CKKS, multi-key BFV, and an
encrypted-CNN inference demo), re-designed TPU-first:

- 28/29-bit RNS primes in uint32 (the TPU VPU is a 32-bit machine; the
  reference's 54-60-bit primes are a 64-bit-CPU optimization). Same scheme,
  same ring degrees, same total modulus sizes => equivalent security and
  noise behaviour. All ring arithmetic is exact integer arithmetic.
- Dense batched tensors instead of per-party maps: a multi-key ciphertext is
  a uint32[k+1, L, N] array; per-party loops in the reference become batched
  reductions on the party axis.
- Negacyclic NTT/iNTT, gadget decomposition, external products and RNS basis
  conversion as vectorized XLA programs with fused Pallas TPU kernels on the
  hot paths.
- Multi-chip scaling via jax.sharding.Mesh over (party, limb, coeff) axes.

Package layout mirrors the reference's layer map (SURVEY.md section 1):
  ops/      ring/arithmetic substrate (reference L0: lattigo ring layer)
  mkrlwe/   multi-key RLWE core        (reference L1: mkrlwe/)
  mkckks/   multi-key CKKS scheme      (reference L2a: mkckks/)
  mkbfv/    multi-key BFV scheme       (reference L2b: mkbfv/)
  models/   encrypted-CNN demo         (reference L3: cnn/)
  parallel/ device-mesh sharding       (new; reference has none)
"""

__version__ = "0.1.0"
