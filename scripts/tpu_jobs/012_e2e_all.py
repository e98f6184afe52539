"""Matched-RMSE gate evidence: TPU-vs-CPU exact agreement + MC scaling."""
import json
import numpy as np
import jax.numpy as jnp
import nori_tpu.scenes_builtin as sb
import nori_tpu.wavefront as wf

# 1) exact agreement at identical config (96x54, 4 spp, seed 77):
#    counter-based RNG makes sample values backend-independent up to
#    float reassociation in differently-fused compiles
sc = sb.living_room(width=96, height=54, spp=4, detail=5)
img_tpu, _ = wf.render_wavefront(sc, spp=4, n_lanes=8192, seed=77)
cpu = np.load("/tmp/lr_cpu_ref.npz")["img"]
diff = np.abs(img_tpu - cpu)
agree_rmse = float(np.sqrt(np.mean((img_tpu - cpu) ** 2)))
print(f"TPU-vs-CPU same config: max|diff|={diff.max():.2e} "
      f"rmse={agree_rmse:.2e} (MC noise at 4spp ~ 1e-1)")

# 2) MC scaling: TPU 1024-spp pair rmse (seeds 11/12) from job 006 =
#    0.013294 -> single-image noise ~ 0.0094.  Verify 64-spp noise
#    scales by 4x as 1/sqrt(spp) predicts.
a64, _ = wf.render_wavefront(sc, spp=64, n_lanes=65536, seed=21)
b64, _ = wf.render_wavefront(sc, spp=64, n_lanes=65536, seed=22)
pair64 = float(np.sqrt(np.mean((a64 - b64) ** 2)))
d = np.load("/tmp/lr_small_tpu.npz")
pair1024 = float(np.sqrt(np.mean((d["a"] - d["b"]) ** 2)))
print(f"pair rmse 64spp={pair64:.5f} 1024spp={pair1024:.5f} "
      f"ratio={pair64/pair1024:.2f} (1/sqrt model predicts 4.0)")

# 3) cross-spp RMSE: TPU 1024 vs independent TPU 64 should equal
#    sqrt(n64^2 + n1024^2) ~= n64 within tolerance
r = float(np.sqrt(np.mean((d["a"] - a64) ** 2)))
pred = float(np.sqrt((pair64 ** 2 + pair1024 ** 2) / 2))
print(f"rmse(1024spp, 64spp indep) = {r:.5f}, MC prediction "
      f"{pred:.5f} ratio {r/pred:.2f}")

out = {
    "exact_gate": {"config": "96x54 4spp seed77",
                   "max_abs_diff": float(diff.max()),
                   "rmse": agree_rmse},
    "mc_scaling": {"pair_rmse_64": pair64, "pair_rmse_1024": pair1024,
                   "ratio": pair64 / pair1024, "model": 4.0},
    "cross_spp": {"rmse_1024_vs_64": r, "mc_prediction": pred},
}
with open("/tmp/rmse_gate.json", "w") as f:
    json.dump(out, f, indent=1)
print("written /tmp/rmse_gate.json")
