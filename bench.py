"""Driver benchmark: prints ONE JSON line.

Headline metric: HONEST end-to-end secp256k1 ECDSA-verify proving latency at
k=15 — witness re-generation on a pinned prover builder + synthesis +
create_proof, the same region the reference's published 1.98 s covers
(its create_proof re-runs the witness closure; BASELINE.md).
`vs_baseline` > 1 means faster than the reference.

Runs on whatever JAX platform the ambient environment provides (real TPU
under the driver; CPU works too). First invocation pays SRS generation and
XLA compiles; the SRS is cached under params/ and compiles land in the
persistent XLA cache (a warm TPU seed under params/xla_cache/tpu-v1 is
regenerated from the final kernels when the device is reachable), so
steady-state rounds measure the real proving time. MSM and NTT kernel
throughputs ride along in `extra` when the time budget allows.

Fallback: if the full prover path fails, report device NTT throughput so the
round still produces a benchmark point.

Env knobs: HALO2_BENCH=ecdsa|ntt|msm|inner_product|mul (default ecdsa),
HALO2_BENCH_K (default 15), HALO2_BENCH_BUDGET_S, HALO2_BENCH_NO_KERNELS.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_ECDSA_K15_S = 1.98


def ecdsa_test_inputs():
    import random

    from halo2_lib_tpu.ecc.ecdsa import ecdsa_sign
    from halo2_lib_tpu.utils.curves import SECP256K1

    rng = random.Random(42)
    n = SECP256K1.scalar
    priv = rng.randrange(1, n.p)
    pub = SECP256K1.mul(SECP256K1.g, priv)
    msghash = rng.randrange(1, n.p)
    nonce = rng.randrange(1, n.p)
    r, s = ecdsa_sign(SECP256K1, priv, msghash, nonce)
    return pub, r, s, msghash


def ecdsa_witness(builder, inputs):
    """Run the ECDSA-verify witness logic on a builder (MOCK or PROVER stage)."""
    from halo2_lib_tpu.ecc.ec import EccChip
    from halo2_lib_tpu.ecc.ecdsa import ecdsa_verify_no_pubkey_check
    from halo2_lib_tpu.ecc.fp import FpChip
    from halo2_lib_tpu.utils.curves import SECP256K1

    pub, r, s, msghash = inputs
    range_chip = builder.range_chip()
    fp_chip = FpChip(range_chip, 88, 3, SECP256K1.base)
    fq_chip = FpChip(range_chip, 88, 3, SECP256K1.scalar)
    chip = EccChip(fp_chip, SECP256K1)
    ctx = builder.main(0)
    pk_pt = chip.load_private(ctx, pub)
    r_a = fq_chip.load_private(ctx, r)
    s_a = fq_chip.load_private(ctx, s)
    m_a = fq_chip.load_private(ctx, msghash)
    out = ecdsa_verify_no_pubkey_check(chip, ctx, pk_pt, r_a, s_a, m_a, 4, 4)
    assert out.val() == 1
    return builder


def build_ecdsa_builder(k: int, lookup_bits: int):
    from halo2_lib_tpu.gates.circuit import BaseCircuitBuilder, CircuitBuilderStage

    builder = BaseCircuitBuilder.from_stage(CircuitBuilderStage.MOCK).use_k(k)
    builder.set_lookup_bits(lookup_bits)
    ecdsa_witness(builder, ecdsa_test_inputs())
    builder.calculate_params(minimum_rows=9)
    p = builder.config_params
    p.num_advice_per_phase[0] = max(p.num_advice_per_phase[0], 2)
    p.num_lookup_advice_per_phase[0] = max(p.num_lookup_advice_per_phase[0], 1)
    return builder


def _mark(label: str, t0: float) -> float:
    now = time.time()
    sys.stderr.write(f"[bench] {label}: {now - t0:.2f}s\n")
    sys.stderr.flush()
    return now


def bench_ecdsa(k: int) -> dict:
    """Honest end-to-end proving latency: the timed region re-generates the
    witness on a pinned PROVER-stage builder and runs create_proof (which
    synthesizes the circuit internally) — exactly what the reference's
    1.98 s covers (`base_test().bench_builder`, utils/testing.rs:198-247:
    the prover path re-runs the witness closure inside the timed proof)."""
    import halo2_lib_tpu.backend.prover as prover_mod
    from halo2_lib_tpu.backend.keygen import keygen
    from halo2_lib_tpu.backend.kzg import gen_srs
    from halo2_lib_tpu.backend.prover import create_proof
    from halo2_lib_tpu.backend.verifier import verify_proof
    from halo2_lib_tpu.utils.pinning import pinning_of

    inputs = ecdsa_test_inputs()
    t = time.time()
    params = gen_srs(k)
    t = _mark("gen_srs", t)
    builder = build_ecdsa_builder(k, k - 1)
    t = _mark("keygen witness gen", t)
    circuit = builder.synthesize()
    t = _mark("synthesize", t)
    pk = keygen(params, builder, circuit)
    pinning = pinning_of(builder)
    t = _mark("keygen", t)
    if os.environ.get("HALO2_PRECOMPILE") == "1":
        from halo2_lib_tpu.backend.precompile import warm_prover

        warm_prover(params, pk)
        t = _mark("precompile warm-up", t)

    pipelined = (
        params._native_msm() is not None
        and os.environ.get("HALO2_NO_PIPELINE") != "1"
    )

    def e2e() -> tuple[bytes, float, float]:
        """(proof, total seconds, witness-gen seconds)."""
        t0 = time.time()
        pb = pinning.prover_builder()
        if pipelined:
            # witgen runs WHILE completed advice columns flatten/upload/
            # commit in background threads (backend/pipeline.py); the
            # timed region still covers the full witness regeneration
            from halo2_lib_tpu.backend.pipeline import prove_pipelined

            proof = prove_pipelined(
                params, pk, pb, lambda b: ecdsa_witness(b, inputs)
            )
            return proof, time.time() - t0, 0.0
        ecdsa_witness(pb, inputs)
        witgen = time.time() - t0
        proof = create_proof(params, pk, pb)
        return proof, time.time() - t0, witgen

    # warmup (pays XLA compiles), then the timed run with stage breakdown
    proof, _, _ = e2e()
    t = _mark("e2e warmup", t)
    stages: dict[str, float] = {}
    orig_stage = prover_mod._stage
    orig_debug = prover_mod._DEBUG

    def timed_stage(label, t0):
        now = time.time()
        stages[label] = round(now - t0, 3)
        return now

    prover_mod._stage = timed_stage
    prover_mod._DEBUG = False
    proof, dt, witgen_s = e2e()
    prover_mod._stage = orig_stage
    prover_mod._DEBUG = orig_debug
    assert verify_proof(params, pk.vk, proof)
    return {
        "metric": f"ecdsa_prove_e2e_k{k}_latency",
        "value": round(dt, 3),
        "unit": "s",
        "vs_baseline": round(BASELINE_ECDSA_K15_S / dt, 4),
        "extra": {
            "stages_s": stages,
            "witness_gen_s": round(witgen_s, 3),
            "create_proof_s": round(dt - witgen_s, 3),
        },
    }


def _sync(x):
    """Force execution + a tiny host fetch (block_until_ready can be a no-op
    on deferred remote backends; fetching bytes is the only honest sync)."""
    import numpy as np

    import jax

    while isinstance(x, (tuple, list)):
        x = x[0]
    np.asarray(jax.device_get(x.ravel()[:8]))


def bench_msm(log_n: int = 20, iters: int = 3) -> dict:
    """bn254 G1 MSM throughput (BASELINE.json headline kernel).

    Digits are generated on device (uploading 2^20 scalars over a remote
    tunnel would dwarf the kernel). Bases are n fully DISTINCT device-built
    curve points, so the bucket gather sees a true SRS-scale HBM access
    pattern (see inline comment).
    """
    import random

    import jax
    import jax.numpy as jnp

    from halo2_lib_tpu.ops.ec_device import DeviceCurve, msm_device
    from halo2_lib_tpu.ops.limbs import DeviceField
    from halo2_lib_tpu.utils.curves import BN254_G1

    from halo2_lib_tpu.ops.ec_device import msm_window_bits

    rng = random.Random(12)
    n = 1 << log_n
    dc = DeviceCurve(DeviceField(BN254_G1.base), BN254_G1)
    df = dc.df
    # n FULLY DISTINCT curve points built ON DEVICE as three-level sums
    # s1[i % 256] + s2[(i >> 8) % 256] + s3[i >> 16] of host random points
    # (untimed setup): an SRS-like gather pattern — every bucket gather hits
    # a distinct HBM address, nothing is tiled or window-repeated.
    s1 = [BN254_G1.random_point(rng) for _ in range(256)]
    s2 = [BN254_G1.random_point(rng) for _ in range(256)]
    s3 = [BN254_G1.random_point(rng) for _ in range(max(n >> 16, 1))]
    P1, P2, P3 = dc.pack_points(s1), dc.pack_points(s2), dc.pack_points(s3)
    idx = jnp.arange(n)

    @jax.jit
    def build_bases(P1, P2, P3):
        g1 = tuple(jnp.take(t, idx % 256, axis=1) for t in P1)
        g2 = tuple(jnp.take(t, (idx >> 8) % 256, axis=1) for t in P2)
        g3 = tuple(jnp.take(t, jnp.minimum(idx >> 16, len(s3) - 1), axis=1) for t in P3)
        X, Y, Z = dc._add(dc._add(g1, g2), g3)
        # normalize to the affine lift msm_device expects (Z in {0, R})
        zinv = df._batch_inv(Z)
        zi2 = df._mont_mul(zinv, zinv)
        return (
            df._mont_mul(X, zi2),
            df._mont_mul(Y, df._mont_mul(zi2, zinv)),
            jnp.broadcast_to(df.one_mont(()), Z.shape),
        )

    P = jax.block_until_ready(build_bases(P1, P2, P3))
    wb = msm_window_bits(n)
    W = -(-254 // wb)
    key = jax.random.PRNGKey(7)
    digit_sets = [
        jax.random.randint(jax.random.fold_in(key, i), (W, n), 0, 1 << wb, dtype=jnp.int32)
        for i in range(iters)
    ]
    _sync(msm_device(dc, P, digit_sets[0], wb))  # compile
    t0 = time.time()
    for i in range(iters):
        _sync(msm_device(dc, P, digit_sets[i], wb))
    dt = (time.time() - t0) / iters
    return {
        "metric": f"msm_2^{log_n}_throughput",
        "value": round(n / dt),
        "unit": "points/s",
        "vs_baseline": 0.0,
    }


def bench_inner_product(k: int = 19, iters: int = 2) -> dict:
    """Criterion-analog micro-bench: create_proof latency for a circuit of
    repeated 5-element inner products at k=19 (the reference's
    halo2-base/benches/inner_product.rs:36-71 shape)."""
    import random

    from halo2_lib_tpu.backend.keygen import keygen
    from halo2_lib_tpu.backend.kzg import gen_srs
    from halo2_lib_tpu.backend.prover import create_proof
    from halo2_lib_tpu.backend.verifier import verify_proof
    from halo2_lib_tpu.core.cells import Existing, Witness
    from halo2_lib_tpu.gates.circuit import BaseCircuitBuilder, CircuitBuilderStage
    from halo2_lib_tpu.gates.flex_gate import GateChip
    from halo2_lib_tpu.utils.fields import FR_BN254
    from halo2_lib_tpu.utils.pinning import pinning_of

    rng = random.Random(0)

    def witness(builder):
        gate = GateChip(FR_BN254)
        ctx = builder.main(0)
        # ~fill the usable rows with 5-element inner products (11 cells each)
        reps = ((1 << k) - 16) // 11
        for _ in range(reps):
            a = [Witness(rng.randrange(FR_BN254.p)) for _ in range(5)]
            b = [Witness(rng.randrange(FR_BN254.p)) for _ in range(5)]
            gate.inner_product(ctx, a, b)
        return builder

    builder = witness(BaseCircuitBuilder.from_stage(CircuitBuilderStage.MOCK).use_k(k))
    builder.calculate_params(minimum_rows=9)
    p = builder.config_params
    p.num_advice_per_phase[0] = max(p.num_advice_per_phase[0], 2)
    params = gen_srs(k)
    pk = keygen(params, builder)
    pinning = pinning_of(builder)

    def e2e():
        pb = pinning.prover_builder()
        witness(pb)
        return create_proof(params, pk, pb)

    proof = e2e()  # warmup / compiles
    assert verify_proof(params, pk.vk, proof)
    t0 = time.time()
    for _ in range(iters):
        proof = e2e()
    dt = (time.time() - t0) / iters
    return {
        "metric": f"inner_product_prove_k{k}_latency",
        "value": round(dt, 3),
        "unit": "s",
        "vs_baseline": 0.0,
    }


def bench_mul(k: int = 9, iters: int = 3) -> dict:
    """Criterion-analog micro-bench: create_proof latency for a circuit of
    chained muls at k=9 (the reference's halo2-base/benches/mul.rs:21 shape:
    120 sequential `gate.mul` chains filling the rows)."""
    import random

    from halo2_lib_tpu.backend.keygen import keygen
    from halo2_lib_tpu.backend.kzg import gen_srs
    from halo2_lib_tpu.backend.prover import create_proof
    from halo2_lib_tpu.backend.verifier import verify_proof
    from halo2_lib_tpu.core.cells import Existing, Witness
    from halo2_lib_tpu.gates.circuit import BaseCircuitBuilder, CircuitBuilderStage
    from halo2_lib_tpu.gates.flex_gate import GateChip
    from halo2_lib_tpu.utils.fields import FR_BN254
    from halo2_lib_tpu.utils.pinning import pinning_of

    rng = random.Random(0)

    def witness(builder):
        gate = GateChip(FR_BN254)
        ctx = builder.main(0)
        a = ctx.load_witness(rng.randrange(FR_BN254.p))
        reps = ((1 << k) - 16) // 4
        for _ in range(reps):
            a = gate.mul(ctx, Existing(a), Witness(rng.randrange(FR_BN254.p)))
        return builder

    builder = witness(BaseCircuitBuilder.from_stage(CircuitBuilderStage.MOCK).use_k(k))
    builder.calculate_params(minimum_rows=9)
    p = builder.config_params
    p.num_advice_per_phase[0] = max(p.num_advice_per_phase[0], 2)
    params = gen_srs(k)
    pk = keygen(params, builder)
    pinning = pinning_of(builder)

    def e2e():
        pb = pinning.prover_builder()
        witness(pb)
        return create_proof(params, pk, pb)

    proof = e2e()  # warmup / compiles
    assert verify_proof(params, pk.vk, proof)
    t0 = time.time()
    for _ in range(iters):
        proof = e2e()
    dt = (time.time() - t0) / iters
    return {
        "metric": f"mul_prove_k{k}_latency",
        "value": round(dt, 3),
        "unit": "s",
        "vs_baseline": 0.0,
    }


def bench_ntt(log_n: int = 20, iters: int = 5) -> dict:
    # default 2^20: the 2^22 MXU-NTT executable reproducibly crashes the
    # remote TPU compile helper (HTTP 500); 2^20 compiles and runs reliably
    import jax
    import jax.numpy as jnp

    from halo2_lib_tpu.ops.limbs import N_LIMBS, DeviceField
    from halo2_lib_tpu.ops.ntt import NTT
    from halo2_lib_tpu.utils.fields import FR_BN254

    df = DeviceField(FR_BN254)
    ntt = NTT(df, log_n)
    n = 1 << log_n
    key = jax.random.PRNGKey(3)
    # random elements < 2^240 < p, generated on device (no host upload)
    xs = []
    for i in range(2):
        limbs = jax.random.randint(
            jax.random.fold_in(key, i), (N_LIMBS, n), 0, 1 << 16, dtype=jnp.int32
        ).astype(jnp.uint32)
        xs.append(limbs.at[N_LIMBS - 1].set(0))
    _sync(ntt.forward(xs[0]))  # compile
    t0 = time.time()
    for i in range(iters):
        _sync(ntt.forward(xs[i % 2]))
    dt = (time.time() - t0) / iters
    return {
        "metric": f"ntt_2^{log_n}_throughput",
        "value": round(n / dt),
        "unit": "elems/s",
        "vs_baseline": 0.0,
    }


def _device_alive(timeout_s: int = 150) -> bool:
    """Probe the ambient accelerator in a SUBPROCESS: a half-dead tunnel can
    HANG jax.devices() forever, which would hang the whole bench with no
    output. The subprocess gets killed on timeout; the parent's jax (not yet
    backend-initialized) can then be pinned to CPU."""
    import subprocess

    try:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=timeout_s,
            capture_output=True,
        )
        return r.returncode == 0
    except Exception:
        return False


def main():
    mode = os.environ.get("HALO2_BENCH", "ecdsa")
    k = int(os.environ.get("HALO2_BENCH_K", "15"))
    t_start = time.time()
    cpu_fallback = False
    if not _device_alive():
        sys.stderr.write(
            "accelerator unreachable; benching on the CPU platform at reduced k\n"
        )
        import jax

        jax.config.update("jax_platforms", "cpu")
        os.environ.setdefault("HALO2_BENCH_NO_KERNELS", "1")
        # a CPU ECDSA e2e at real k risks blowing the driver budget on
        # compiles; the mul micro-bench always yields a benchmark point
        mode = os.environ.get("HALO2_BENCH_CPU_MODE", "mul")
        cpu_fallback = True
    # Leave headroom under the driver's run budget: kernel side-benches are
    # skipped when the headline path (cold XLA compiles included) already
    # consumed this many seconds.
    budget_s = float(os.environ.get("HALO2_BENCH_BUDGET_S", "600"))
    try:
        if mode == "ntt":
            result = bench_ntt()
        elif mode == "msm":
            result = bench_msm(int(os.environ.get("HALO2_BENCH_MSM_LOGN", "20")))
        elif mode == "inner_product":
            result = bench_inner_product(int(os.environ.get("HALO2_BENCH_IP_K", "19")))
        elif mode == "mul":
            result = bench_mul(int(os.environ.get("HALO2_BENCH_MUL_K", "9")))
        else:
            result = bench_ecdsa(k)
            # standing kernel metrics alongside the headline latency
            if os.environ.get("HALO2_BENCH_NO_KERNELS") != "1":
                try:
                    for fn in (bench_msm, bench_ntt):
                        if time.time() - t_start > budget_s:
                            sys.stderr.write("kernel bench skipped (time budget)\n")
                            break
                        m = fn()
                        result.setdefault("extra", {})[m["metric"]] = m["value"]
                except Exception as e:  # noqa: BLE001
                    sys.stderr.write(f"kernel bench skipped ({type(e).__name__}: {e})\n")
    except Exception as e:  # noqa: BLE001 - always emit a benchmark point
        sys.stderr.write(f"bench fallback ({type(e).__name__}: {e})\n")
        try:
            result = bench_ntt(20)
        except Exception as e2:  # noqa: BLE001 - device unreachable entirely
            sys.stderr.write(f"device fallback ({type(e2).__name__}: {e2})\n")
            import jax

            jax.config.update("jax_platforms", "cpu")
            result = bench_mul(int(os.environ.get("HALO2_BENCH_MUL_K", "9")))
            cpu_fallback = True
    if cpu_fallback:
        result.setdefault("extra", {})["note"] = (
            "TPU backend unreachable; CPU-platform fallback at reduced k"
        )
    print(json.dumps(result))


if __name__ == "__main__":
    main()
