"""Dataloading: one parameterised RGB-D dataset loader covering the five
reference dataset conventions (TUM / Real / Synth / EightRoom / HM3D), plus a
procedural synthetic scene generator used as the deterministic test fixture.
"""

from .loader import RGBDDataset, CONVENTIONS  # noqa: F401
from .synthetic import (SyntheticScene, default_scene, render_scene,  # noqa: F401
                        ring_poses, write_synth_dataset)
