"""Generated protobuf bindings for model serialization.

``model_pb2.py`` is generated from ``model.proto`` (protoc 3.21) and checked
in so no build step is required.  Regenerate with:

    protoc --python_out=waldboost_tpu/proto --proto_path=waldboost_tpu/proto \
        waldboost_tpu/proto/model.proto
"""

from . import model_pb2

__all__ = ["model_pb2"]
