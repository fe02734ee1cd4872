import time, jax, numpy as np
from boxmot_tpu.ops.rotated_iou import iou_batch_obb
from boxmot_tpu.ops.pallas_rotated_iou import rotated_iou_pallas
rng = np.random.default_rng(0)
def mk(n):
    b = np.zeros((n,5), np.float32)
    b[:,0]=rng.uniform(0,1920,n); b[:,1]=rng.uniform(0,1080,n)
    b[:,2]=rng.uniform(10,200,n); b[:,3]=rng.uniform(10,200,n)
    b[:,4]=rng.uniform(-np.pi,np.pi,n)
    return b
print("compiling pallas @128x256...", flush=True)
t0=time.perf_counter()
a,b = mk(128), mk(256)
got = np.asarray(rotated_iou_pallas(a,b))
print("compiled+ran in", round(time.perf_counter()-t0,1), "s", flush=True)
ref = np.asarray(jax.jit(iou_batch_obb)(a,b))
print("128x256 max|diff| =", np.abs(ref-got).max(), flush=True)
def bench(fn, a, b, iters):
    out = fn(a,b); out.block_until_ready()
    ts=[]
    for _ in range(iters):
        t0=time.perf_counter(); out = fn(a,b); out.block_until_ready()
        ts.append(time.perf_counter()-t0)
    return min(ts)
f_jnp = jax.jit(iou_batch_obb)
for n in (1024, 2048):
    a,b = mk(n), mk(n)
    tj = bench(f_jnp, a, b, 10)
    tp = bench(rotated_iou_pallas, a, b, 10)
    print(f"N={n}: jnp {tj*1e3:.2f} ms ({n*n/tj/1e9:.2f} Gpair/s)  pallas {tp*1e3:.2f} ms ({n*n/tp/1e9:.2f} Gpair/s)", flush=True)
for n in (4096, 8192):
    a,b = mk(n), mk(n)
    tp = bench(rotated_iou_pallas, a, b, 5)
    print(f"N={n}: pallas {tp*1e3:.2f} ms ({n*n/tp/1e9:.2f} Gpair/s)  [jnp OOMs at 4096]", flush=True)
print("DONE_PROBE", flush=True)
