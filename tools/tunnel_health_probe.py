import time, sys
import numpy as np
import jax
jax.config.update("jax_platforms", "axon")  # explicit: this probes the TPU
import jax.numpy as jnp
# warm-up (includes handshake+compile; a dead tunnel hangs here and the
# outer timeout fires with no output)
x = jnp.ones((1024, 1024), jnp.bfloat16)
v = float((x @ x)[0, 0])
# small probe: varied input defeats dispatch memoization
t0 = time.time()
y = jnp.full((1024, 1024), float(np.random.rand()) + 0.5, jnp.bfloat16)
v = float((y @ y)[0, 0])
print(f"small={time.time() - t0:.2f}", flush=True)
# heavy probe: the quantized sick regime completes small ops fast but puts
# ANY heavy program on a ~296 s cycle — this is the discriminating signal
t1 = time.time()
z = jnp.full((2048, 2048), float(np.random.rand()) + 0.5, jnp.float32)
for _ in range(4):
    z = z @ z * 1e-4
v = float(z[0, 0])
print(f"heavy={time.time() - t1:.2f}", flush=True)
