"""ONNX export/import without the `onnx` package.

Reference tier: `python/hetu/onnx/` (hetu2onnx + onnx2hetu + 26 op
handlers over the `onnx` pip package, which this environment lacks —
the reference would simply disable export, `hetu2onnx.py:19-24`).
Rebuilt here as: a minimal protobuf codec for the public onnx.proto
schema (`proto.py`), a jaxpr->ONNX exporter (`export.py`) and a
pure-numpy ONNX executor (`runtime.py`).
"""

from herald_tpu.onnx.export import export_inference, export_state  # noqa
from herald_tpu.onnx.runtime import OnnxModel  # noqa
