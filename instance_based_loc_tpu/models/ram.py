"""RAM (Recognize Anything) open-set tagger skeleton — the cascade's stage 1
(reference: `recognize-anything` submodule, Swin-L at 384^2, producing a
'a | b | c' tag caption split on '|' — object_finder.py:272-277).

The production RAM couples a Swin-L vision tower with a tag-embedding
decoder; here the Swin-L tower is the full flax implementation
(models/swin.py) and the tagging head is a per-tag sigmoid classifier over
pooled features — the inference contract (image -> list of tag strings over a
fixed vocabulary with per-tag thresholds) matches, and checkpoint porting of
the full decoder is the remaining round-2 work. Weights-free runs return an
empty caption, which the cascade handles by accepting an explicit caption
(`find(..., caption=[...])`), exactly like the reference's `caption` override.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .swin import SwinTransformer, SWIN_L

# A compact indoor-object vocabulary standing in for RAM's 4585-tag list;
# replace with the full tag list when porting real weights.
DEFAULT_TAG_VOCAB = (
    "chair table sofa lamp plant bed cabinet shelf monitor keyboard cup "
    "bottle book box bag pillow curtain door window sink toilet bathtub "
    "refrigerator oven microwave television couch desk stool bench vase "
    "bin crate barrel toy floor ground wall ceiling person"
).split()


def build_ram_tagger(checkpoint_path: str | None = None,
                     tag_vocab: list[str] | None = None,
                     threshold: float = 0.68,
                     image_size: int = 384):
    """tagger(rgb) -> list[str] for CascadeDetector."""
    import dataclasses
    import flax.linen as nn

    vocab = list(tag_vocab or DEFAULT_TAG_VOCAB)
    cfg = dataclasses.replace(SWIN_L, img_size=image_size)

    class RamHead(nn.Module):
        @nn.compact
        def __call__(self, images):
            feats = SwinTransformer(cfg, name="backbone")(images)
            logits = nn.Dense(len(vocab), name="tag_head")(feats["pooled"])
            return logits

    model = RamHead()
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, image_size, image_size, 3), jnp.float32))
    have_weights = checkpoint_path is not None
    if have_weights:
        import pickle
        with open(checkpoint_path, "rb") as f:
            params = pickle.load(f)

    @jax.jit
    def apply(img):
        return jax.nn.sigmoid(model.apply(params, img))

    def tagger(rgb: np.ndarray) -> list[str]:
        if not have_weights:
            return []  # cascade falls back to an explicit caption
        from PIL import Image
        img = np.asarray(Image.fromarray(rgb.astype(np.uint8)).resize(
            (image_size, image_size), Image.BILINEAR), np.float32) / 255.0
        img = (img - np.array([0.485, 0.456, 0.406])) / np.array(
            [0.229, 0.224, 0.225])
        probs = np.asarray(apply(jnp.asarray(img[None], jnp.float32)))[0]
        return [vocab[i] for i in np.nonzero(probs > threshold)[0]]

    return tagger
