"""Auditable multi-chip scaling model (no multi-chip hardware needed).

Multi-chip TPU hardware is not available in this container, so the >=70%
scaling-efficiency target (BASELINE.md) cannot be measured directly. This
script produces the auditable stand-in the target calls for:

  1. COMPILE each sharded mult path over an 8-device virtual CPU mesh at
     logN=13-shaped parameters (compiled modules are fully inlined and
     post-SPMD-partitioning, so every collective op instance is visible —
     lowered-only StableHLO outlines nested jits into called funcs and
     undercounts).
  2. Parse the HLO for inter-device collectives (collective-permute,
     all-to-all, all-reduce / psum, all-gather, reduce-scatter) and sum
     the bytes each device sends per multiplication.
  3. Scale bytes to flagship PN15QP880 shapes (collectives move
     ciphertext/digit tensors; bytes are linear in limbs x N — factor
     (28 * 2^15) / (14 * 2^13) = 8) and project scaling efficiency
     against the measured single-chip device time with a stated
     interconnect model:

         eff(C) = T1 / (C * (T1/C + bytes_per_dev / BW_ICI))

     assuming zero compute/comm overlap (conservative) and per-device ICI
     bandwidth BW_ICI (v5e: 4 links x ~45 GB/s usable; we charge the
     busiest direction at 45 GB/s, i.e. no multi-link striping credit).

Run: python benchmarks/scaling_model.py  (forces a CPU backend with 8
virtual devices; results + methodology recorded in BENCH_NOTES.md).
"""

import os
import re
import sys

os.environ.setdefault("XLA_FLAGS", "")
if "host_platform_device_count" not in os.environ["XLA_FLAGS"]:
    os.environ["XLA_FLAGS"] += " --xla_force_host_platform_device_count=8"
os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np  # noqa: E402
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax.numpy as jnp  # noqa: E402
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa
from jax.experimental import mesh_utils  # noqa: E402

def _latest_headline_ms() -> float:
    """Single-chip headline ms from the newest BENCH_r*.json (the
    round's own measurement), falling back to BASELINE_MEASURED-era
    notes. Overridable with SCALING_T1_MS."""
    import glob
    import json
    root = os.path.join(os.path.dirname(__file__), "..")
    best = None
    for path in sorted(glob.glob(os.path.join(root, "BENCH_r*.json"))):
        try:
            with open(path) as f:
                doc = json.load(f)
            doc = doc.get("parsed", doc)  # driver wraps the JSON line
            if doc is None:   # a timed-out round records parsed: null
                continue
            if "mkckks_mulrelin" in doc.get("metric", ""):
                best = float(doc["value"])  # later rounds win
        except (OSError, ValueError, KeyError):
            continue
    return best if best else 26.9


# single-chip measured device time for the headline mult: read from the
# latest round's BENCH_r*.json so the table always reflects the current
# kernel state (VERDICT r3 weak #3: a stale hard-coded T1)
T1_MS = (float(os.environ["SCALING_T1_MS"])
         if os.environ.get("SCALING_T1_MS") else _latest_headline_ms())
BW_ICI_GBS = float(os.environ.get("SCALING_BW_GBS", "45.0"))
# cross-host DCN bandwidth per host for the party axis (BASELINE config 4:
# "8-party ... party-dim sharded across hosts"): ~100 Gbps effective
BW_DCN_GBS = float(os.environ.get("SCALING_DCN_GBS", "12.5"))

HLO_BYTES = {"u32": 4, "s32": 4, "f32": 4, "u64": 8, "s64": 8, "f64": 8,
             "pred": 1, "u8": 1, "s8": 1, "bf16": 2, "u16": 2, "s16": 2}


def collective_bytes(hlo_text: str):
    """Per-collective (count, bytes a device sends) from a COMPILED
    (post-partitioning, inlined) HLO module.

    Bytes come from the op's result shape (per-device shapes after
    partitioning; for these collectives result size == operand size except
    all-gather, where the result is the gathered size — we charge the
    operand share, result/C). For all-reduce (psum leaving the result
    replicated over C devices) a ring implementation sends
    ~2*(C-1)/C ~= 2x the shard bytes; we charge 2x (conservative).
    """
    out = {}
    pat = re.compile(
        r"=\s+\(?([a-z0-9]+)\[([0-9,]*)\][^ ]*\s+"
        r"(collective-permute|all-to-all|all-reduce|all-gather|"
        r"reduce-scatter)(-start)?\(")
    for line in hlo_text.splitlines():
        if "-done(" in line:
            continue  # async op: counted at its -start
        m = pat.search(line)
        if not m:
            continue
        dt, dims, name = m.groups()[:3]
        bt = HLO_BYTES.get(dt)
        if bt is None:
            continue
        size = 1
        for d_ in dims.split(","):
            if d_:
                size *= int(d_)
        b = size * bt
        if name == "all-reduce":
            b *= 2.0
        elif name == "all-gather":
            b /= 8.0  # each device contributes its shard of the result
        cnt, tot = out.get(name, (0, 0.0))
        out[name] = (cnt + 1, tot + b)
    return out


def report(path_name, counts, nshards, scale_f, note="", dcn=False):
    raw = sum(b for _, b in counts.values())
    total = raw * scale_f
    print(f"\n### {path_name}")
    if note:
        print(note)
    for name, (cnt, b) in sorted(counts.items()):
        print(f"  {name:22s} x{cnt:<4d} {b/1e6:10.2f} MB/device (model "
              f"scale)")
    comm_ms = total / (BW_ICI_GBS * 1e9) * 1e3
    c = nshards
    t_comp = T1_MS / c
    eff = T1_MS / (c * (t_comp + comm_ms))
    print(f"  flagship-scaled total {total/1e6:.2f} MB/device -> comm "
          f"{comm_ms:.3f} ms @ {BW_ICI_GBS:.0f} GB/s")
    print(f"  projected {c}-chip efficiency: {100*eff:.1f}% "
          f"(T1={T1_MS:.2f} ms, no-overlap model)")
    if dcn:
        # 2-host model for the party axis: each host reduces its local
        # parties over ICI (charged above), then the two hosts exchange
        # the aggregated x/y/v partials once over DCN — the psum bytes
        # are independent of the per-host party count, so the cross-host
        # leg moves the SAME per-device total at DCN bandwidth.
        comm_dcn = total / (BW_DCN_GBS * 1e9) * 1e3
        eff2 = T1_MS / (c * (t_comp + comm_ms + comm_dcn))
        print(f"  2-host DCN leg: +{comm_dcn:.3f} ms @ {BW_DCN_GBS:.1f} "
              f"GB/s -> projected cross-host efficiency {100*eff2:.1f}%")
        # Sensitivity grid (VERDICT r4 #6): the single-point 75.5% claim
        # is only as good as its assumptions, so vary all three — DCN
        # bandwidth (degraded/nominal/good), a per-hop latency term (a
        # ring all-reduce over H hosts takes 2(H-1) serialized hops),
        # and the host count (ring all-reduce moves 2(H-1)/H x the
        # aggregate bytes vs the 2-host single exchange).
        print("  cross-host sensitivity (rows: hosts x DCN GB/s x "
              "per-hop latency):")
        print(f"    {'hosts':>5s} {'GB/s':>6s} {'lat_us':>7s} "
              f"{'comm_ms':>8s} {'eff':>6s}")
        for hosts in (2, 4):
            bfac = 2.0 * (hosts - 1) / hosts / 1.0  # vs 1.0 at 2 hosts
            bfac /= 2.0 * (2 - 1) / 2
            for bw in (6.25, 12.5, 25.0):
                for lat_us in (0.0, 25.0, 100.0):
                    cms = total * bfac / (bw * 1e9) * 1e3 \
                        + 2 * (hosts - 1) * lat_us * 1e-3
                    e = T1_MS / (c * (t_comp + comm_ms + cms))
                    print(f"    {hosts:5d} {bw:6.2f} {lat_us:7.0f} "
                          f"{cms:8.3f} {100*e:5.1f}%")
    return path_name, total, comm_ms, eff


def main():
    import dataclasses
    from mkhe_tpu import mkrlwe, mkckks
    from mkhe_tpu.mkrlwe import keyswitch as ksw
    from mkhe_tpu.parallel import party_mul

    # logN=13-shaped model of the flagship mult: same party count, same
    # limb-pair structure, 6 levels. Collective bytes scale to PN15QP880
    # by (28 limbs * 2^15) / (L_model * 2^13).
    params = mkckks.new_parameters(
        13, 12, q0_bits=28.9, level_bits=27.0, levels=6,
        scale=2.0 ** 54, p_bits=28.4, p_count=4)
    rp = params.rlwe
    parties = 4
    kgen = mkrlwe.KeyGenerator(rp, seed=5)
    rlk = mkrlwe.RelinearizationKeySet()
    ids = tuple(f"user{i}" for i in range(parties))
    for uid in ids:
        sk, _ = kgen.gen_key_pair(uid)
        rlk.add(kgen.gen_relinearization_key(sk, kgen.gen_secret_key(uid)))
    b, d, v = rlk.stacked(ids)
    level = rp.max_level
    lq = level + 1
    scale_f = (28 * (1 << 15)) / (lq * rp.n)
    data = jnp.zeros((parties + 1, lq, rp.n), jnp.uint32)
    ct = mkrlwe.Ciphertext(ids=ids, data=data)

    # ---- 1. coeff-sharded explicit ppermute path ------------------------
    cmesh = Mesh(mesh_utils.create_device_mesh((8,)), ("coeff",))
    params_d = dataclasses.replace(
        rp, ring_q=rp.ring_q.with_dist("coeff", 8),
        ring_p=rp.ring_p.with_dist("coeff", 8),
        ring_qp=rp.ring_qp.with_dist("coeff", 8))
    u_key = rp.crs_at(-1, level)

    def body(d0, d1, b_, d_, v_, u_):
        out = ksw.mul_and_relin(
            params_d, mkrlwe.Ciphertext(ids=ids, data=d0),
            mkrlwe.Ciphertext(ids=ids, data=d1), (b_, d_, v_), level,
            u_key=u_)
        return out.data

    last = lambda nd: P(*([None] * (nd - 1) + ["coeff"]))
    fn = jax.shard_map(body, mesh=cmesh,
                       in_specs=(last(3), last(3), last(4), last(4),
                                 last(4), last(3)),
                       out_specs=last(3))
    txt = jax.jit(fn).lower(data, data, b, d, v, u_key).compile().as_text()
    report("coefficient sharding (explicit hypercube ppermute NTT), C=8",
           collective_bytes(txt), 8, scale_f,
           "every NTT/iNTT exchanges log2(C)=3 chunk permutes per call")

    # ---- 2. party sharding (shard_map + psum) ---------------------------
    pmesh = Mesh(mesh_utils.create_device_mesh(
        (4,), devices=jax.devices()[:4]), ("party",))
    txt = jax.jit(
        lambda dd: party_mul.mul_and_relin_party_sharded(
            rp, dataclasses.replace(ct, data=dd), (b, d, v), pmesh).data
    ).lower(data).compile().as_text()
    report("party sharding (psum of x/y/v partials), k=4 over 4 devices",
           collective_bytes(txt), 4, scale_f,
           "x/y digit psums dominate; count independent of party count",
           dcn=True)

    # ---- 3. GSPMD rns x coeff ------------------------------------------
    gmesh = Mesh(mesh_utils.create_device_mesh((2, 4)), ("rns", "coeff"))
    ct_sh = NamedSharding(gmesh, P(None, "rns", "coeff"))
    key_sh = NamedSharding(gmesh, P(None, None, "rns", "coeff"))
    data_g = jax.device_put(data, ct_sh)
    bg, dg, vg = (jax.device_put(a, key_sh) for a in (b, d, v))

    def gfn(dd, b_, d_, v_):
        out = ksw.mul_and_relin(rp, dataclasses.replace(ct, data=dd),
                                dataclasses.replace(ct, data=dd),
                                (b_, d_, v_), level)
        return out.data

    with gmesh:
        txt = jax.jit(gfn).lower(data_g, bg, dg, vg).compile().as_text()
    report("GSPMD (rns x coeff) 2x4, XLA-chosen collectives",
           collective_bytes(txt), 8, scale_f,
           "post-SPMD-partitioner compiled module")

    # ---- 4. GSPMD rns-only 8-way ---------------------------------------
    # keep coefficients LOCAL (NTTs need no communication at all); only
    # the limb-axis contractions (mod_up/mod_down/rescale) communicate.
    rmesh = Mesh(mesh_utils.create_device_mesh(
        (7,), devices=jax.devices()[:7]), ("rns",))  # 14 limbs / 7 devs
    ct_sh2 = NamedSharding(rmesh, P(None, "rns", None))
    data_r = jax.device_put(data, ct_sh2)
    # keys replicated (Lqp=18 has no 7-way split; GSPMD chooses their
    # internal layout from the limb-sharded ciphertext inputs)
    with rmesh:
        txt = jax.jit(gfn).lower(data_r, b, d, v).compile().as_text()
    report("GSPMD rns-only 7-way (local NTTs, XLA-chosen collectives)",
           collective_bytes(txt), 7, scale_f,
           "limb-axis sharding: communication only at base conversions")

    print("\nMethodology: per-collective result shapes from the COMPILED "
          "(inlined, partitioned) HLO of a logN=13 model, scaled "
          f"x{scale_f:.1f} to PN15QP880 (collective bytes are linear in "
          "limbs x N); all-reduce charged 2x (ring), all-gather charged "
          "operand share; efficiency = T1/(C*(T1/C + bytes/BW)); no "
          "overlap credit. Regenerate: python benchmarks/scaling_model.py")


if __name__ == "__main__":
    main()
