"""Independent wire-format validation of the hand-rolled ONNX writer.

onnxruntime/onnx are not installable here, so this is the strongest
available external check: the artifacts produced by
``deployment/onnx_proto.py`` are parsed by GOOGLE'S protobuf runtime
through a protoc-compiled ONNX schema (``deployment/onnx_schema.proto``,
field numbers per the public ONNX IR spec). If our writer mis-encoded any
field, stock tooling — which uses exactly this schema — could not load the
models; here protobuf itself is the referee.
"""

import shutil
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

ROOT = Path(__file__).parent.parent
PROTO = ROOT / "xiaoicesing_io_tpu/deployment/onnx_schema.proto"

pytestmark = pytest.mark.skipif(
    shutil.which("protoc") is None, reason="protoc not available"
)


@pytest.fixture(scope="module")
def onnx_pb2(tmp_path_factory):
    out = tmp_path_factory.mktemp("onnx_pb2")
    subprocess.run(
        ["protoc", f"--proto_path={PROTO.parent}", f"--python_out={out}",
         PROTO.name],
        check=True,
    )
    sys.path.insert(0, str(out))
    try:
        import onnx_schema_pb2  # noqa: E402
    finally:
        sys.path.pop(0)
    return onnx_schema_pb2


def test_simple_model_parses_with_google_protobuf(onnx_pb2, rng):
    import jax.numpy as jnp

    from xiaoicesing_io_tpu.deployment.onnx_export import export_onnx

    W = rng.standard_normal((8, 16)).astype(np.float32)

    def f(x):
        return jnp.tanh(x @ W)

    x = rng.standard_normal((2, 8)).astype(np.float32)
    data = export_onnx(f, [x], None, input_names=["x"], output_names=["y"])

    m = onnx_pb2.ModelProto()
    m.ParseFromString(data)
    assert m.ir_version == 8
    assert m.opset_import[0].version == 17
    g = m.graph
    assert [i.name for i in g.input] == ["x"]
    assert [o.name for o in g.output] == ["y"]
    assert any(n.op_type == "MatMul" for n in g.node)
    assert any(n.op_type == "Tanh" for n in g.node)
    # input type/shape survived
    t = g.input[0].type.tensor_type
    assert t.elem_type == 1  # FLOAT
    assert [d.dim_value for d in t.shape.dim] == [2, 8]
    # the weight initializer's raw bytes round-trip exactly
    (w,) = [t for t in g.initializer if tuple(t.dims) == (8, 16)]
    np.testing.assert_array_equal(
        np.frombuffer(w.raw_data, np.float32).reshape(8, 16), W
    )


def test_loop_model_parses_with_google_protobuf(onnx_pb2):
    """The merged loop-bearing graph (Loop node with a GraphProto `body`
    attribute, int64/bool scalar inputs) parses through stock protobuf with
    the subgraph intact."""
    import jax.numpy as jnp

    from xiaoicesing_io_tpu.deployment.onnx_loop import build_reflow_graph
    from xiaoicesing_io_tpu.deployment.onnx_proto import build_model

    D = np.eye(4, dtype=np.float32) * 0.1

    def den(x, t, c):
        return jnp.einsum("bftm,mk->bftk", x, D) + t.reshape(-1, 1, 1, 1) * 0.0

    g = build_reflow_graph(
        den, (1, 1, 8, 4), (1, 8, 4),
        spec_min=np.full((1, 1, 1), -1.0, np.float32),
        spec_max=np.ones((1, 1, 1), np.float32),
        t_start_cfg=0.4, time_scale_factor=1000.0, shallow=True,
    )
    data = build_model(g)

    m = onnx_pb2.ModelProto()
    m.ParseFromString(data)
    loops = [n for n in m.graph.node if n.op_type == "Loop"]
    assert len(loops) == 1
    (battr,) = [a for a in loops[0].attribute if a.name == "body"]
    assert battr.type == 5  # AttributeProto.GRAPH
    body = battr.g
    # body signature: (iter int64 [], cond bool [], carried x)
    assert body.input[0].type.tensor_type.elem_type == 7  # INT64
    assert body.input[1].type.tensor_type.elem_type == 9  # BOOL
    assert len(body.output) == 2
    assert any(n.op_type == "MatMul" or n.op_type == "Mul" for n in body.node)
    # graph I/O includes the runtime scalars
    names = [i.name for i in m.graph.input]
    assert names[-2:] == ["depth", "steps"]
