"""MXU achieved-FLOPS probe: is the tunnel executing on the chip at all?

Chains k 4096x4096 bf16 matmuls in one scanned program (one dispatch, one
value readback) for k = 2/4/8 and regresses elapsed-vs-k, so readback and
dispatch overhead cancel and the MARGINAL seconds-per-matmul is the
device's own execution speed. One 4096^2 bf16 matmul is 137 GFLOP:

- healthy v5e (MXU, ~394 TFLOPS bf16 peak): ~0.35-1 ms per matmul,
  i.e. >= tens of TFLOPS achieved marginal
- sick quantized regime (measured 21:58 UTC Aug 18, round 3):
  0.164 s per matmul = 838 GFLOPS marginal — ~0.2% of peak, and
  exactly the throughput of single-core AMX-BF16 *CPU* execution
  (this host's CPU advertises amx-bf16)

The diagnosis: in the quantized regime the "TPU" executes programs at
CPU speed, ~470x below the chip's matmul speed-of-light. Any end-to-end
fps measured inside that regime (1.7 fps = 579 ms/frame slope, r2=1.0)
is the infrastructure, not the framework — which is why bench.py refuses
instead of printing it. Run this to re-attribute a low reading.
"""
import time

import numpy as np
import jax
jax.config.update("jax_platforms", "axon")  # explicit: probes the TPU
import jax.numpy as jnp

N = 4096
FLOP_PER_MM = 2 * N ** 3
V5E_PEAK_TFLOPS = 394.0


def make_program(k):
    @jax.jit
    def f(x):
        def body(c, _):
            return (c @ c) * jnp.bfloat16(1e-2) + jnp.bfloat16(0.5), None
        c, _ = jax.lax.scan(body, x, None, length=k)
        return jnp.float32(c[0, 0])
    return f


def main():
    rng = np.random.default_rng(0)
    ks, ts = [], []
    for k in (2, 4, 8):
        f = make_program(k)
        warm = jnp.asarray(rng.random((N, N), np.float32) + 0.5,
                           jnp.bfloat16)
        float(f(warm))  # compile + first execution: discard
        best = float("inf")
        for _ in range(2):
            x = jnp.asarray(rng.random((N, N), np.float32) + 0.5,
                            jnp.bfloat16)
            t0 = time.perf_counter()
            float(f(x))
            best = min(best, time.perf_counter() - t0)
        ks.append(k)
        ts.append(best)
        print(f"k={k}: {best:.3f}s  chain={k * FLOP_PER_MM / best / 1e9:.1f}"
              " GFLOPS", flush=True)
    # marginal from the LARGEST-k pair: a regime transition mid-ladder
    # (observed: the quantum vanished between k=2 and k=4, making the
    # global fit negative) corrupts the full regression, but the largest
    # pair reflects the current regime; floor at 10 us/matmul (readback
    # noise) so a near-zero marginal reads as ">=" MXU speed, not infinity
    slope = max((ts[-1] - ts[-2]) / (ks[-1] - ks[-2]), 1e-5)
    gflops = FLOP_PER_MM / slope / 1e9
    pct = 100.0 * gflops / (V5E_PEAK_TFLOPS * 1e3)
    print(f"marginal (k={ks[-2]}->k={ks[-1]}): {slope * 1e3:.2f} ms/matmul"
          f" = {gflops:.0f} GFLOPS achieved ({pct:.2f}% of v5e bf16 peak)")
    verdict = ("MXU-speed (chip executing)" if gflops > 2e4 else
               "CPU-speed (infrastructure executing off-chip or throttled "
               ">100x — do not trust e2e numbers from this regime)")
    print(f"verdict: {verdict}")


if __name__ == "__main__":
    main()
