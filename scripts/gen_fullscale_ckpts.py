"""Synthesize FULL-SCALE random-init checkpoints in the exact file formats
the porters accept (VERDICT r2 items 4/9): the real-weights deployment path
— fetch_checkpoints.sh file layout -> porter -> cascade serving — rehearsed
end-to-end without network egress. Weights are random (HF init), shapes and
key layouts are exactly the deployment ones:

  ram_swin_large_14m.pth   official timm layout, Swin-L@384, 4585 tags
  ram_tag_list.txt         4585-line tag vocabulary
  sam_vit_h_synthetic.pth  official segment-anything layout, ViT-H@1024
  gdino_swinb_synthetic.bin  HF GroundingDinoForObjectDetection layout
  vocab.txt                WordPiece vocab with BERT special-token ids
                           (101/102/1012) at their bert-base-uncased slots

    python scripts/gen_fullscale_ckpts.py /tmp/ibl_fullscale_ckpts

The RAM class_threshold is set to keep a realistic handful of tags firing
per frame under random logits (sigmoid of N(0,~2) at 0.997 -> a few of
4585), so the downstream GroundingDINO caption stays deployment-shaped.
"""

import os
import sys

import numpy as np
import torch


def write_ram(out: str):
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))))
    from instance_based_loc_tpu.models.ram import RamConfig
    from tests.test_ram import _synthetic_official_sd
    cfg = RamConfig()
    rng = np.random.default_rng(0)
    sd = _synthetic_official_sd(cfg, rng)
    # a realistic tag rate under random weights: only extreme logits fire
    sd["class_threshold"] = np.full((cfg.num_tags,), 0.997, np.float32)
    torch.save({k: torch.as_tensor(v) for k, v in sd.items()},
               os.path.join(out, "ram_swin_large_14m.pth"))
    words = [f"thing{i:04d}" for i in range(cfg.num_tags)]
    with open(os.path.join(out, "ram_tag_list.txt"), "w") as f:
        f.write("\n".join(words) + "\n")
    print(f"ram: {sum(v.size for v in sd.values())/1e6:.0f}M params")


def write_sam(out: str):
    import transformers
    from tests.test_fullscale_parity import (_sam_h_hf_config,
                                             _hf_to_official_sam_key)
    torch.manual_seed(0)
    hf = transformers.SamModel(_sam_h_hf_config(1024))
    official = {_hf_to_official_sam_key(k): v
                for k, v in hf.state_dict().items()}
    torch.save(official, os.path.join(out, "sam_vit_h_synthetic.pth"))
    print(f"sam-h: {sum(p.numel() for p in hf.parameters())/1e6:.0f}M params")


def write_gdino(out: str):
    import transformers
    from tests.test_fullscale_parity import _gdino_fullscale_hf_config
    torch.manual_seed(0)
    hf = transformers.GroundingDinoForObjectDetection(
        _gdino_fullscale_hf_config(800))
    torch.save(hf.state_dict(),
               os.path.join(out, "gdino_swinb_synthetic.bin"))
    print(f"gdino: {sum(p.numel() for p in hf.parameters())/1e6:.0f}M params")
    # WordPiece vocab with the special ids where bert-base-uncased puts
    # them (make_text_masks SPECIAL_TOKEN_IDS contract: CLS 101, SEP 102,
    # "." 1012); real words fill the tail so RAM tags tokenize stably.
    # filler extends through id 1029 so no "thingNNNN" lands on a member of
    # SPECIAL_TOKEN_IDS (101/102/1012/1029) — a tag at a special id would get
    # a wrong block-diagonal text mask during deployment rehearsal
    vocab = ["[PAD]"] * 101 + ["[CLS]", "[SEP]"] + \
        [f"unused{i}" for i in range(909)] + ["."] + \
        [f"unused{909 + i}" for i in range(17)]
    vocab += [f"thing{i:04d}" for i in range(6000)]
    from instance_based_loc_tpu.models.gdino import SPECIAL_TOKEN_IDS
    assert all(not vocab[sid].startswith("thing")
               for sid in SPECIAL_TOKEN_IDS)
    with open(os.path.join(out, "vocab.txt"), "w") as f:
        f.write("\n".join(vocab) + "\n")


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/ibl_fullscale_ckpts"
    os.makedirs(out, exist_ok=True)
    write_ram(out)
    write_sam(out)
    write_gdino(out)
    print(f"checkpoints under {out}")


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    main()
