"""Export an orbax trainer checkpoint to the flat params-only .npz format
(models/dator/train.py save_params_npz) — the committed cross-round resume
artifact. Orbax step dirs (params + adamw moments, ~1.9 GB f32 at FourDNet
ViT-B scale) are too heavy for git; the f16 npz (~300 MB) is not, and git is
the only state that survives the build container between rounds.

    python scripts/export_params_npz.py out/dator_ckpt/step_50 out/dator_params_e50.npz
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")


def main(step_dir: str, out_path: str) -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    import orbax.checkpoint as ocp

    from instance_based_loc_tpu.models.dator.train import save_params_npz

    with ocp.StandardCheckpointer() as ckptr:
        raw = ckptr.restore(os.path.abspath(step_dir))
    params = raw["params"] if "params" in raw else raw
    save_params_npz(params, out_path)
    n = sum(x.size for x in jax.tree.leaves(params))
    mb = os.path.getsize(out_path) / 2**20
    print(f"wrote {out_path}: {n / 1e6:.1f}M params, {mb:.1f} MB "
          f"(step={raw.get('step')})")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
