"""Models: embedders (CLIP / DINOv2 / ViT / DATOR dispatch), the detection
cascade, and the DATOR ReID training stack (reference layers L0, L2, L3)."""
