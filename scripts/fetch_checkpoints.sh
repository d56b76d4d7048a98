#!/bin/bash
# Fetch every pretrained checkpoint the instance_based_loc_tpu porters accept.
# TPU-side role of the reference's bash_scripts/download_ram_sam_weights.sh
# (which fetched only RAM + SAM); each file below feeds a parity-tested
# porter (tests/test_{ram,sam_parity,gdino_parity,vit,clip_bpe,wordpiece}.py).
#
# Usage: CKPT_DIR=/path/to/ckpts bash scripts/fetch_checkpoints.sh
# Needs network access; on an air-gapped box copy the files in by hand.
set -euo pipefail

dir="${CKPT_DIR:-${HOME}/ibl_checkpoints}"
mkdir -p "$dir"
cd "$dir"

hf="https://huggingface.co"

fetch() {  # fetch <url> <out>
  [ -f "$2" ] && { echo "have $2"; return; }
  wget -q --show-progress -O "$2" "$1"
}

# --- perception cascade -----------------------------------------------------
# RAM Swin-L tagger (reference object_finder.py:98: ram_swin_large_14m @384)
#   -> models/ram.py port_ram_params; vocabulary is data (index-aligned with
#      the checkpoint's label_embed rows).
fetch "$hf/spaces/xinyu1205/recognize-anything/resolve/main/ram_swin_large_14m.pth" \
      ram_swin_large_14m.pth
fetch "https://raw.githubusercontent.com/xinyu1205/recognize-anything/main/ram/data/ram_tag_list.txt" \
      ram_tag_list.txt

# SAM ViT-H segmenter (reference object_finder.py:116: sam_vit_h_4b8939)
#   -> models/sam.py port_sam_params (official layout; HF layout also works
#      via port_hf_sam_params).
fetch "https://dl.fbaipublicfiles.com/segment_anything/sam_vit_h_4b8939.pth" \
      sam_vit_h_4b8939.pth

# GroundingDINO SwinB grounder (reference object_finder.py:98-106 pulls the
# SwinB checkpoint from the HF hub) -> models/gdino.py port_hf_gdino_params
# (HF GroundingDinoForObjectDetection layout, BERT text tower included);
# the WordPiece tokenizer needs bert-base-uncased vocab.txt.
fetch "$hf/IDEA-Research/grounding-dino-base/resolve/main/pytorch_model.bin" \
      grounding-dino-base.bin
fetch "$hf/bert-base-uncased/resolve/main/vocab.txt" bert_vocab.txt

# --- embedders (utils/embeddings.py roles) ----------------------------------
# ViT-in21k / DINOv2 / CLIP-visual -> models/vit.py porters
fetch "$hf/google/vit-base-patch16-224-in21k/resolve/main/pytorch_model.bin" \
      vit-base-in21k.bin
fetch "$hf/facebook/dinov2-base/resolve/main/pytorch_model.bin" dinov2-base.bin
fetch "$hf/openai/clip-vit-base-patch32/resolve/main/pytorch_model.bin" \
      clip-vit-b32.bin

# CLIP text tower + byte-level BPE (clip_loc/clip_utils.py role)
#   -> models/clip_text.py + models/bpe.py (vocab.json + merges.txt)
fetch "$hf/openai/clip-vit-base-patch32/resolve/main/vocab.json" clip_vocab.json
fetch "$hf/openai/clip-vit-base-patch32/resolve/main/merges.txt" clip_merges.txt

# DATOR pretrained towers (reference make_model.py:466-477 loads ImageNet
# weights then freezes all but LoRA) -> models/dator/transreid_vit.py
# port_hf_vit_to_transreid via cli/dator_train.py --pretrained
# (re-uses vit-base-in21k.bin above).

echo "done -> $dir"
echo "cascade:   --detector cascade --ram-checkpoint $dir/ram_swin_large_14m.pth"
echo "           --ram-tag-list $dir/ram_tag_list.txt --sam-checkpoint $dir/sam_vit_h_4b8939.pth"
echo "           --gdino-checkpoint $dir/grounding-dino-base.bin --gdino-vocab $dir/bert_vocab.txt"
echo "embedders: --embeddings vit|dino|clip --embedder-checkpoint <matching .bin above>"
