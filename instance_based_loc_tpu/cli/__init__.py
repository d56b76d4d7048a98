"""CLI trial scripts preserving the reference CLI contract (BASELINE.json):
{tum, real, synth, 8room, hm3d} memory-build and localisation trials with
--embeddings {dino, clip, vit, dator, color, dummy}, --map-pcd-cache-path,
--load-memory/--memory-load-path."""
