"""Object memory core: instance records, memory build (process_image),
consolidation (downsample / floor removal / four reclustering strategies),
persistence, and the localise re-ID + pose solver.

Reference layer L6: `object_memory/` (SURVEY.md §2.5).
"""

from .object_info import ObjectInfo  # noqa: F401
from .object_memory import ObjectMemory  # noqa: F401
from .detection import (Detections, ColorRegionDetector,  # noqa: F401
                        DepthRegionDetector)
