"""LoraRevolver — a base ViT with a library of swappable LoRA adapters
(reference `object_memory/lora_module.py:25-129`: base HF ViT + PEFT LoRA
checkpoints in a `ckpt_library`, hot-swapped by name, `encode_image` returns
the CLS token).

Here the base trunk is the flax ViT and adapters are rank-r (down, up) pairs
added onto every block's qkv kernel — the same adapter shape TransReID's
AttentionWithLoRA trains (vit_pytorch.py:167-196), so DATOR-trained adapters
can be loaded straight into the embedder library. Swapping an adapter is a
pure-functional param update (no model rebuild), and unlike the reference's
empty train/save stubs (lora_module.py:119-129), saving/loading the library
round-trips through npz.
"""

from __future__ import annotations

import pickle

import numpy as np
import jax
import jax.numpy as jnp

from .vit import ViT, VARIANTS


class LoraRevolver:
    """Manage a library of LoRA adapters over one frozen ViT trunk."""

    def __init__(self, variant: str = "vit", rank: int = 4,
                 checkpoint_path: str | None = None):
        from .vit_embedder import load_params

        key = "dinov2" if variant == "dino" else variant
        self.cfg = VARIANTS[key]
        self.rank = rank
        self.model = ViT(self.cfg)
        self.base_params = load_params(self.model, self.cfg, variant,
                                       checkpoint_path)
        self.ckpt_library: dict[str, dict] = {}
        self.active: str | None = None
        self._params = self.base_params

        @jax.jit
        def apply(params, batch):
            cls, _ = self.model.apply(params, batch)
            return cls

        self._apply = apply

    # ------------------------------------------------------------------ #
    def _merged_params(self, adapter: dict) -> dict:
        """Fold {block_name: (down (D, r), up (r, 3*D))} into qkv kernels."""
        import flax
        params = flax.core.unfreeze(jax.tree_util.tree_map(lambda x: x,
                                                           self.base_params))
        d = self.cfg.hidden_size
        n_heads = self.cfg.num_heads
        d_head = d // n_heads
        for block, (down, up) in adapter.items():
            kernel = params["params"][block]["attn"]["qkv"]["kernel"]
            delta = (np.asarray(down) @ np.asarray(up)).reshape(
                d, 3, n_heads, d_head)
            params["params"][block]["attn"]["qkv"]["kernel"] = (
                kernel + jnp.asarray(delta, kernel.dtype))
        return params

    def load_lora_ckpt_from_file(self, ckpt_path: str, name: str):
        """Register an adapter from disk (lora_module.py:72-89). Accepts the
        npz this class saves, or a pickled {block: (down, up)} dict."""
        if ckpt_path.endswith(".npz"):
            data = np.load(ckpt_path, allow_pickle=True)
            adapter = pickle.loads(data["adapter"].tobytes())
        else:
            with open(ckpt_path, "rb") as f:
                adapter = pickle.load(f)
        self.ckpt_library[name] = adapter

    def save_lora_ckpt(self, name: str, ckpt_path: str):
        adapter = self.ckpt_library[name]
        np.savez(ckpt_path, adapter=np.frombuffer(pickle.dumps(adapter),
                                                  dtype=np.uint8))

    def register_adapter(self, name: str, adapter: dict):
        """adapter: {block_name: (down (D, r), up (r, 3*D))}."""
        self.ckpt_library[name] = adapter

    def switch_to_ckpt(self, name: str | None):
        """Hot-swap the active adapter (None = base model)."""
        if name is None:
            self._params = self.base_params
        else:
            self._params = self._merged_params(self.ckpt_library[name])
        self.active = name

    # ------------------------------------------------------------------ #
    def encode_image(self, batch: np.ndarray) -> np.ndarray:
        """(B, H, W, 3) preprocessed -> (B, hidden) CLS embeddings
        (lora_module.py:91-117 returns the CLS token)."""
        return np.asarray(self._apply(self._params, jnp.asarray(batch)))

    def as_embedder(self, variant_for_preprocess: str = "vit"):
        """Batched ObjectMemory embedding callable running the ACTIVE adapter."""
        from .vit_embedder import preprocess_crop

        def embed(detections, **_):
            n = len(detections)
            if n == 0:
                return np.zeros((0, self.cfg.hidden_size), np.float32)
            batch = np.stack([
                preprocess_crop(c, variant_for_preprocess, self.cfg.image_size)
                for c in detections.crops])
            return self.encode_image(batch)

        return embed
