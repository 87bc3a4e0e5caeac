"""End-to-end encrypted CNN inference wall-clock on TPU (per-layer and
total), mirroring cnn/cnn_bench_test.go. First pass compiles (persistent
cache), second pass is timed."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_mkhe"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from mkhe_tpu import mkrlwe, mkckks
    from mkhe_tpu.models import cnn

    params = mkckks.PN14QP433_CNN()
    for rot in cnn.EXTRA_ROTS:
        params = params.add_crs(rot)
    rots = list(cnn.EXTRA_ROTS) + [1 << i for i in range(params.logn - 1)]
    kgen = mkrlwe.KeyGenerator(params.rlwe, seed=41)
    sk_set = mkrlwe.SecretKeySet()
    pk_set = mkrlwe.PublicKeySet()
    rlk = mkrlwe.RelinearizationKeySet()
    rtk = mkrlwe.RotationKeySet()
    for uid in ("dataOwner", "modelOwner"):
        sk, pk = kgen.gen_key_pair(uid)
        r = kgen.gen_secret_key(uid)
        sk_set.add(sk)
        pk_set.add(pk)
        rlk.add(kgen.gen_relinearization_key(sk, r))
        for rot in rots:
            rtk.add(kgen.gen_rotation_key(rot, sk))
    enc = mkckks.Encryptor(params, seed=42)
    ev = mkckks.Evaluator(params)

    kernels, fc1, fc2, b1, b2 = cnn.load_weights()
    rng = np.random.default_rng(7)
    img = rng.uniform(0, 1, (28, 28))
    slots = params.slots
    pk_d, pk_m = pk_set.get("dataOwner"), pk_set.get("modelOwner")
    ct_img = enc.encrypt_msg(
        mkckks.Message(value=cnn.pack_image(img, slots)), pk_d)
    ct_k = [enc.encrypt_msg(mkckks.Message(value=v), pk_m)
            for v in cnn.pack_kernels(kernels, slots)]
    ct_fc1 = [enc.encrypt_msg(mkckks.Message(value=v), pk_m)
              for v in cnn.pack_fc1(fc1, slots)]
    ct_fc2 = enc.encrypt_msg(
        mkckks.Message(value=cnn.pack_fc2(fc2, slots)), pk_m)
    ct_b1 = enc.encrypt_msg(mkckks.Message(value=cnn.pack_b1(b1, slots)),
                            pk_m)
    ct_b2 = enc.encrypt_msg(mkckks.Message(value=cnn.pack_b2(b2, slots)),
                            pk_m)
    pt_mask = enc.encode_msg(mkckks.Message(value=cnn.mask_vector(slots)))

    def pipeline():
        stamps = {}
        t0 = time.perf_counter()
        h_img = ev.hoisted_form(ct_img)
        h_k = [ev.hoisted_form(c) for c in ct_k]
        h_fc1 = [ev.hoisted_form(c) for c in ct_fc1]
        conv = cnn.convolution(ev, rlk, rtk, ct_img, h_img, ct_k, h_k)
        _ = int(conv.ct.data[0, 0, 0])
        stamps["conv_ms"] = (time.perf_counter() - t0) * 1e3
        t1 = time.perf_counter()
        h_conv = ev.hoisted_form(conv)
        sq1 = ev.mul_relin_hoisted_new(conv, conv, h_conv, h_conv, rlk)
        h_sq1 = ev.hoisted_form(sq1)
        f1 = cnn.fc1_layer(ev, rlk, rtk, sq1, h_sq1, ct_fc1, h_fc1, ct_b1)
        _ = int(f1.ct.data[0, 0, 0])
        stamps["fc1_ms"] = (time.perf_counter() - t1) * 1e3
        t2 = time.perf_counter()
        h_f1 = ev.hoisted_form(f1)
        sq2 = ev.mul_relin_hoisted_new(f1, f1, h_f1, h_f1, rlk)
        f2 = cnn.fc2_layer(ev, rlk, rtk, sq2, ct_fc2, ct_b2, pt_mask,
                           params.scale)
        _ = int(f2.ct.data[0, 0, 0])
        stamps["fc2_ms"] = (time.perf_counter() - t2) * 1e3
        stamps["total_ms"] = (time.perf_counter() - t0) * 1e3
        return stamps

    t0 = time.perf_counter()
    pipeline()  # compile pass
    print(f"compile+run pass: {time.perf_counter()-t0:.1f} s", flush=True)
    import json
    for k, v in pipeline().items():
        print(json.dumps({"metric": f"cnn_{k}", "value": round(v, 1),
                          "unit": "ms"}), flush=True)

    # fused single-XLA-program inference (one dispatch for the pipeline)
    fn, args = cnn.build_fused_inference(params, rlk, rtk, ct_img, ct_k,
                                         ct_fc1, ct_fc2, ct_b1, ct_b2,
                                         pt_mask)
    t0 = time.perf_counter()
    out = fn(*args)
    _ = int(out.ct.data[0, 0, 0])
    print(f"fused compile+run: {time.perf_counter()-t0:.1f} s", flush=True)
    # end-to-end correctness of the fused program: decrypt and compare
    # against the plaintext forward pass (same check as tests/test_cnn.py)
    dec = mkckks.Decryptor(params)
    logits = np.real(dec.decrypt(out, sk_set).value[:cnn.CLASSES])
    want = cnn.plain_forward(img, kernels, fc1, fc2, b1, b2)
    assert int(np.argmax(logits)) == int(np.argmax(want)), (logits, want)
    np.testing.assert_allclose(logits, want, rtol=5e-3, atol=5e-3)
    print("fused logits verified vs plaintext forward pass", flush=True)
    best = 1e9
    for _i in range(3):
        t0 = time.perf_counter()
        out = fn(*args)
        _ = int(out.ct.data[0, 0, 0])
        best = min(best, (time.perf_counter() - t0) * 1e3)
    print(json.dumps({"metric": "cnn_fused_total_ms",
                      "value": round(best, 1), "unit": "ms"}), flush=True)

    # chained-k device time: the wall number above carries one relay
    # dispatch + fetch round trip (~tens of ms); the fori_loop slope
    # isolates the on-device inference time (bench.py protocol)
    import dataclasses
    from mkhe_tpu import fuse as fuse_mod

    def chain(cts_, out_):
        img = cts_[0]
        w = out_.ct.data[0, 0, 0]
        new_img = dataclasses.replace(
            img, ct=dataclasses.replace(img.ct, data=img.ct.data ^ w))
        return (new_img,) + tuple(cts_[1:])

    def pipe2(ev2, keys, ct_i, ct_kk, ct_f1, ct_f2, cb1, cb2, msk):
        return cnn._pipeline(ev2, keys.rlk, keys.rtk, ct_i, ct_kk, ct_f1,
                             ct_f2, cb1, cb2, msk, params.scale)
    run_k, kargs = fuse_mod.fuse_chained(
        params, pipe2,
        (ct_img, ct_k, ct_fc1, ct_fc2, ct_b1, ct_b2, pt_mask),
        chain, rlk_set=rlk, rtk_set=rtk)

    def t_of(k):
        t0 = time.perf_counter()
        o = run_k(*kargs, k)
        _ = int(o.ct.data[0, 0, 0])
        return (time.perf_counter() - t0) * 1e3
    t_of(0)
    t_of(5)  # compile both
    dev = min((t_of(5) - t_of(0)) / 5 for _ in range(3))
    print(json.dumps({"metric": "cnn_fused_device_ms",
                      "value": round(dev, 1), "unit": "ms"}), flush=True)


if __name__ == "__main__":
    main()
