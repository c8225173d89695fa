"""TPU integration check: kernel-path encode/forward vs the CPU XLA oracle.

The fused kernels engage only on TPU; per-kernel parity is tested on CPU in
interpret mode, but this script checks the INTEGRATED paths on real hardware
(padding, valid-length threading, routing) against the CPU XLA reference on
identical f32 weights/inputs. Run after kernel changes:

    python scripts/tpu_integration_check.py
"""

import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CHILD = """
import jax
import sys
if sys.argv[1] == "cpu":
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp, numpy as np
sys.path.insert(0, %(root)r)
from tapclip_tpu.config import CLIPConfig, PromptConfig
from tapclip_tpu.models import clip as C
from tapclip_tpu.models.model_wrapper import FullModel

cfg = CLIPConfig(name="itest", image_size=56, patch_size=8, vision_width=128,
                 vision_layers=3, vision_heads=2, vocab_size=520,
                 context_length=16, text_width=128, text_layers=2,
                 text_heads=2, embed_dim=64, dtype="float32")
params = C.init_clip_params(jax.random.PRNGKey(0), cfg)
rng = np.random.default_rng(0)
imgs = jnp.asarray(rng.standard_normal((4, 56, 56, 3)), jnp.float32)
feats = C.encode_image(params, cfg, imgs)
model = FullModel(["A", "B", "C"], params, cfg,
                  prompt_cfg=PromptConfig(max_classes=4))
out = model(np.asarray(imgs), np.asarray([0, 1, 2, 0]))
np.savez(sys.argv[2], feats=np.asarray(feats),
         logits=np.asarray(out["logits"]),
         attribution=np.asarray(out["attribution"]),
         loss=np.asarray(out["loss"]))
print("done", sys.argv[1])
"""


def main():
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    code = CHILD % {"root": root}
    for backend, path in [("cpu", "/tmp/itest_cpu.npz"), ("tpu", "/tmp/itest_tpu.npz")]:
        r = subprocess.run(
            [sys.executable, "-c", code, backend, path],
            capture_output=True, text=True, timeout=560,
        )
        if r.returncode != 0:
            print(r.stdout[-2000:], r.stderr[-2000:])
            raise SystemExit(f"{backend} child failed")
    import numpy as np

    a = np.load("/tmp/itest_cpu.npz")
    b = np.load("/tmp/itest_tpu.npz")
    for key in ["feats", "logits", "attribution", "loss"]:
        err = np.abs(a[key] - b[key]).max()
        denom = max(np.abs(a[key]).max(), 1e-6)
        print(f"{key:12s} max abs err {err:.3e}  (rel {err/denom:.3e})")
        # f32 on both sides; TPU MXU uses bf16-precision passes for f32 dots
        # by default, so tolerate ~1e-2 relative.
        assert err / denom < 2e-2, (key, err)
    print("TPU integration check PASSED")


if __name__ == "__main__":
    main()
