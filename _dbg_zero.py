import sys
import jax
mode = sys.argv[1]
if mode == "cpu":
    jax.config.update("jax_platforms", "cpu")
import numpy as np
from PIL import Image
from guetzli_tpu.search import zeroing
import guetzli_tpu
from guetzli_tpu.config import ProcessStats

orig_fn = zeroing.compute_zeroing_order_batch
def wrapper(cur, orig, xyb0, mask3, vw, vh, limit, steps, lookahead=3):
    np.savez(f"/tmp/zin_{mode}.npz", cur=np.asarray(cur), orig=np.asarray(orig),
             xyb0=np.asarray(xyb0), mask3=np.asarray(mask3),
             vw=np.asarray(vw), vh=np.asarray(vh), limit=np.asarray(limit),
             steps=steps)
    i, e, c = orig_fn(cur, orig, xyb0, mask3, vw, vh, limit, steps, lookahead)
    np.savez(f"/tmp/zout_{mode}.npz", idx=np.asarray(i), err=np.asarray(e),
             cnt=np.asarray(c))
    print("dumped", mode, "counts sum", int(np.asarray(c).sum()))
    sys.exit(0)

zeroing.compute_zeroing_order_batch = wrapper
import guetzli_tpu.search.processor as P
P.zeroing.compute_zeroing_order_batch = wrapper

rgb = np.asarray(Image.open("tests/data/bees.png").convert("RGB"))
guetzli_tpu.process(rgb, quality=95, stats=ProcessStats())
