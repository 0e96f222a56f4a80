"""Binary/image analytics layer (SURVEY.md §2 P4-P9, Phase 2).

The Spark-side plumbing — binary columns with typed metadata, Arrow
``pandas_udf`` stages, detection explode, per-image clustering — is real
and tested; the pixel *codec* is a deterministic fake format (this
container has no cv2/PIL; see codec.py) behind the same interface a real
JPEG decode would use.
"""

from .codec import decode_image, encode_image
from .color import average_color_udf, dominant_color_udf

__all__ = ["decode_image", "encode_image", "average_color_udf", "dominant_color_udf"]
