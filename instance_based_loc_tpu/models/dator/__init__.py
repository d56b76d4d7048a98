"""DATOR: the trainable multi-modal (RGB + depth) object re-identification
model and its training stack (reference `dator/` sub-tree, SURVEY.md §2.8 —
a TransReID fork with LoRA attention, dual-tower deformable fusion
("FourDNet"), P x K sampling, CE + soft-triplet loss, and R1/mAP evaluation).
"""
