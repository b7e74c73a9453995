"""GraphDef -> InceptionV3 params extractor (compat/tf_graphdef).

VERDICT r4 #5: the ADM suite's exact headline network is the OpenAI TF1
frozen graph; the extractor must map its Const weights onto
eval/inception.InceptionV3 with no TensorFlow. These tests build a synthetic
GraphDef with the FULL 2015 topology (94 conv units, towers in concat
order, nested E-block concats, softmax MatMul) through an INDEPENDENT
wire-format encoder written from the proto schema, with random weights, and
assert the extraction is exact, shape-validated, and loadable by the model.
"""

import struct

import numpy as np
import pytest

from maskbit_tpu.compat import tf_graphdef as tfg

# ---------------------------------------------------------------------------
# independent protobuf encoder (schema-written, not shared with the parser)
# ---------------------------------------------------------------------------


def _varint(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _tag(field: int, wire: int) -> bytes:
    return _varint(field << 3 | wire)


def _len_field(field: int, data: bytes) -> bytes:
    return _tag(field, 2) + _varint(len(data)) + data


def _str_field(field: int, s: str) -> bytes:
    return _len_field(field, s.encode())


def _varint_field(field: int, v: int) -> bytes:
    return _tag(field, 0) + _varint(v)


def _float_field(field: int, f: float) -> bytes:
    return _tag(field, 5) + struct.pack("<f", f)


def _shape_proto(shape) -> bytes:
    return b"".join(_len_field(2, _varint_field(1, int(d))) for d in shape)


def _tensor_proto(arr: np.ndarray, use_float_vals: bool = False,
                  broadcast_single: bool = False) -> bytes:
    arr = np.asarray(arr)
    dtype_enum = {np.dtype(np.float32): 1, np.dtype(np.int32): 3,
                  np.dtype(np.int64): 9}[arr.dtype]
    msg = _varint_field(1, dtype_enum) + _len_field(2, _shape_proto(arr.shape))
    if broadcast_single:
        # TF semantics: a single float_val fills the whole shape
        msg += _len_field(5, struct.pack("<f", float(arr.reshape(-1)[0])))
    elif use_float_vals:
        flat = arr.reshape(-1).astype(np.float32)
        msg += _len_field(5, struct.pack(f"<{flat.size}f", *flat))  # packed
    else:
        msg += _len_field(4, arr.tobytes())
    return msg


def _attr_entry(key: str, value_msg: bytes) -> bytes:
    return _len_field(5, _str_field(1, key) + _len_field(2, value_msg))


class GraphBuilder:
    def __init__(self):
        self.nodes = []

    def add(self, name: str, op: str, inputs=(), attrs=b"") -> str:
        msg = _str_field(1, name) + _str_field(2, op)
        for ref in inputs:
            msg += _str_field(3, ref)
        msg += attrs
        self.nodes.append(_len_field(1, msg))
        return name

    def const(self, name: str, arr: np.ndarray, **tensor_kwargs) -> str:
        return self.add(name, "Const",
                        attrs=_attr_entry("value",
                                          _len_field(8, _tensor_proto(arr, **tensor_kwargs))))

    def serialize(self) -> bytes:
        return b"".join(self.nodes)


# ---------------------------------------------------------------------------
# synthetic 2015-topology InceptionV3 graph
# ---------------------------------------------------------------------------


def _conv_unit(g, rng, scope, x, in_ch, out_ch, hw, expect, name,
               eps=0.001, scale=False, vals=False):
    """TF-graph conv unit: Const weights + Conv2D + BNWithGlobalNorm + Relu.
    Records the EXPECTED Flax params under expect[name]."""
    # fan-in scaling keeps the 94-layer random forward finite (unit-normal
    # kernels overflow f32 by Mixed_6x)
    w = (rng.normal(size=(hw[0], hw[1], in_ch, out_ch))
         / np.sqrt(hw[0] * hw[1] * in_ch)).astype(np.float32)
    mean = rng.normal(size=out_ch).astype(np.float32)
    var = rng.uniform(0.5, 2.0, size=out_ch).astype(np.float32)
    beta = rng.normal(size=out_ch).astype(np.float32)
    gamma = (rng.uniform(0.5, 1.5, size=out_ch).astype(np.float32)
             if scale else np.ones(out_ch, np.float32))

    g.const(f"{scope}/conv2d_params", w, use_float_vals=vals)
    conv = g.add(scope, "Conv2D", [x, f"{scope}/conv2d_params"])
    g.const(f"{scope}/batchnorm/moving_mean", mean)
    g.const(f"{scope}/batchnorm/moving_variance", var)
    g.const(f"{scope}/batchnorm/beta", beta, use_float_vals=vals)
    g.const(f"{scope}/batchnorm/gamma", gamma)
    bn_attrs = (_attr_entry("variance_epsilon", _float_field(4, eps))
                + _attr_entry("scale_after_normalization",
                              _varint_field(5, int(scale))))
    bn = g.add(f"{scope}/batchnorm", "BatchNormWithGlobalNormalization",
               [conv, f"{scope}/batchnorm/moving_mean",
                f"{scope}/batchnorm/moving_variance",
                f"{scope}/batchnorm/beta", f"{scope}/batchnorm/gamma"],
               attrs=bn_attrs)
    relu = g.add(f"{scope}/relu", "Relu", [bn])

    expect[name] = {
        "conv": {"kernel": w},
        "bn_scale": gamma, "bn_bias": beta, "bn_mean": mean,
        "bn_var": var + np.float32(eps - 1e-3),
    }
    return relu


def build_inception_graphdef(seed=0, num_classes=1008, corrupt=None):
    """Full 2015-style graph. `corrupt` (optional) tweaks one conv's output
    channels to prove the extractor shape-checks."""
    rng = np.random.default_rng(seed)
    g = GraphBuilder()
    expect = {}

    # input preprocessing tail (what ADM's input_map replaces at ExpandDims)
    g.add("ExpandDims", "Placeholder")
    g.const("resize/size", np.asarray([299, 299], np.int32))
    g.add("ResizeBilinear", "ResizeBilinear", ["ExpandDims", "resize/size"])
    g.const("Sub/y", np.asarray(128.0, np.float32).reshape(()))
    g.add("Sub", "Sub", ["ResizeBilinear", "Sub/y"])
    g.const("Mul/y", np.asarray(1 / 128.0, np.float32).reshape(()))
    g.add("Mul", "Mul", ["Sub", "Mul/y"])

    def unit(scope, x, cin, cout, hw, name, **kw):
        if corrupt == scope:
            cout += 1
        return _conv_unit(g, rng, scope, x, cin, cout, hw, expect, name, **kw)

    # stem (conv, conv_1, conv_2, maxpool, conv_3, conv_4, maxpool)
    x = unit("conv", "Mul", 3, 32, (3, 3), "Conv2d_1a_3x3", vals=True)
    x = unit("conv_1", x, 32, 32, (3, 3), "Conv2d_2a_3x3", scale=True)
    x = unit("conv_2", x, 32, 64, (3, 3), "Conv2d_2b_3x3")
    x = g.add("pool", "MaxPool", [x])
    x = unit("conv_3", x, 64, 80, (1, 1), "Conv2d_3b_1x1", eps=0.002)
    x = unit("conv_4", x, 80, 192, (3, 3), "Conv2d_4a_3x3")
    x = g.add("pool_1", "MaxPool", [x])

    def concat(name, dims, values):
        g.const(f"{name}/dim", np.asarray(dims, np.int32).reshape(()))
        # old-style Concat: dim first, then values
        return g.add(name, "Concat", [f"{name}/dim", *values])

    def concat_v2(name, values):
        g.const(f"{name}/axis", np.asarray(3, np.int32).reshape(()))
        return g.add(name, "ConcatV2", [*values, f"{name}/axis"])

    blocks = {}

    def block_a(scope, x, cin, pf, flax):
        e = blocks.setdefault(flax, {})
        b1 = _conv_unit(g, rng, f"{scope}/conv", x, cin, 64, (1, 1), e, "branch1x1")
        b5 = _conv_unit(g, rng, f"{scope}/tower/conv", x, cin, 48, (1, 1), e, "branch5x5_1")
        b5 = _conv_unit(g, rng, f"{scope}/tower/conv_1", b5, 48, 64, (5, 5), e, "branch5x5_2")
        bd = _conv_unit(g, rng, f"{scope}/tower_1/conv", x, cin, 64, (1, 1), e, "branch3x3dbl_1")
        bd = _conv_unit(g, rng, f"{scope}/tower_1/conv_1", bd, 64, 96, (3, 3), e, "branch3x3dbl_2")
        bd = _conv_unit(g, rng, f"{scope}/tower_1/conv_2", bd, 96, 96, (3, 3), e, "branch3x3dbl_3")
        bp = g.add(f"{scope}/tower_2/pool", "AvgPool", [x])
        bp = _conv_unit(g, rng, f"{scope}/tower_2/conv", bp, cin, pf, (1, 1), e, "branch_pool")
        return concat(f"{scope}/join", 3, [b1, b5, bd, bp]), 64 + 64 + 96 + pf

    def block_b(scope, x, cin, flax):
        e = blocks.setdefault(flax, {})
        b3 = _conv_unit(g, rng, f"{scope}/conv", x, cin, 384, (3, 3), e, "branch3x3")
        bd = _conv_unit(g, rng, f"{scope}/tower/conv", x, cin, 64, (1, 1), e, "branch3x3dbl_1")
        bd = _conv_unit(g, rng, f"{scope}/tower/conv_1", bd, 64, 96, (3, 3), e, "branch3x3dbl_2")
        bd = _conv_unit(g, rng, f"{scope}/tower/conv_2", bd, 96, 96, (3, 3), e, "branch3x3dbl_3")
        bp = g.add(f"{scope}/pool", "MaxPool", [x])
        return concat(f"{scope}/join", 3, [b3, bd, bp]), 384 + 96 + cin

    def block_c(scope, x, cin, c7, flax):
        e = blocks.setdefault(flax, {})
        b1 = _conv_unit(g, rng, f"{scope}/conv", x, cin, 192, (1, 1), e, "branch1x1")
        b7 = _conv_unit(g, rng, f"{scope}/tower/conv", x, cin, c7, (1, 1), e, "branch7x7_1")
        b7 = _conv_unit(g, rng, f"{scope}/tower/conv_1", b7, c7, c7, (1, 7), e, "branch7x7_2")
        b7 = _conv_unit(g, rng, f"{scope}/tower/conv_2", b7, c7, 192, (7, 1), e, "branch7x7_3")
        bd = _conv_unit(g, rng, f"{scope}/tower_1/conv", x, cin, c7, (1, 1), e, "branch7x7dbl_1")
        bd = _conv_unit(g, rng, f"{scope}/tower_1/conv_1", bd, c7, c7, (7, 1), e, "branch7x7dbl_2")
        bd = _conv_unit(g, rng, f"{scope}/tower_1/conv_2", bd, c7, c7, (1, 7), e, "branch7x7dbl_3")
        bd = _conv_unit(g, rng, f"{scope}/tower_1/conv_3", bd, c7, c7, (7, 1), e, "branch7x7dbl_4")
        bd = _conv_unit(g, rng, f"{scope}/tower_1/conv_4", bd, c7, 192, (1, 7), e, "branch7x7dbl_5")
        bp = g.add(f"{scope}/tower_2/pool", "AvgPool", [x])
        bp = _conv_unit(g, rng, f"{scope}/tower_2/conv", bp, cin, 192, (1, 1), e, "branch_pool")
        return concat(f"{scope}/join", 3, [b1, b7, bd, bp]), 768

    def block_d(scope, x, cin, flax):
        e = blocks.setdefault(flax, {})
        b3 = _conv_unit(g, rng, f"{scope}/tower/conv", x, cin, 192, (1, 1), e, "branch3x3_1")
        b3 = _conv_unit(g, rng, f"{scope}/tower/conv_1", b3, 192, 320, (3, 3), e, "branch3x3_2")
        b7 = _conv_unit(g, rng, f"{scope}/tower_1/conv", x, cin, 192, (1, 1), e, "branch7x7x3_1")
        b7 = _conv_unit(g, rng, f"{scope}/tower_1/conv_1", b7, 192, 192, (1, 7), e, "branch7x7x3_2")
        b7 = _conv_unit(g, rng, f"{scope}/tower_1/conv_2", b7, 192, 192, (7, 1), e, "branch7x7x3_3")
        b7 = _conv_unit(g, rng, f"{scope}/tower_1/conv_3", b7, 192, 192, (3, 3), e, "branch7x7x3_4")
        bp = g.add(f"{scope}/pool", "MaxPool", [x])
        return concat(f"{scope}/join", 3, [b3, b7, bp]), 320 + 192 + cin

    def block_e(scope, x, cin, flax, pool_op):
        e = blocks.setdefault(flax, {})
        b1 = _conv_unit(g, rng, f"{scope}/conv", x, cin, 320, (1, 1), e, "branch1x1")
        b3 = _conv_unit(g, rng, f"{scope}/tower/conv", x, cin, 384, (1, 1), e, "branch3x3_1")
        b3a = _conv_unit(g, rng, f"{scope}/tower/mixed/conv", b3, 384, 384, (1, 3), e, "branch3x3_2a")
        b3b = _conv_unit(g, rng, f"{scope}/tower/mixed/conv_1", b3, 384, 384, (3, 1), e, "branch3x3_2b")
        b3 = concat_v2(f"{scope}/tower/mixed", [b3a, b3b])  # nested concat
        bd = _conv_unit(g, rng, f"{scope}/tower_1/conv", x, cin, 448, (1, 1), e, "branch3x3dbl_1")
        bd = _conv_unit(g, rng, f"{scope}/tower_1/conv_1", bd, 448, 384, (3, 3), e, "branch3x3dbl_2")
        bda = _conv_unit(g, rng, f"{scope}/tower_1/mixed/conv", bd, 384, 384, (1, 3), e, "branch3x3dbl_3a")
        bdb = _conv_unit(g, rng, f"{scope}/tower_1/mixed/conv_1", bd, 384, 384, (3, 1), e, "branch3x3dbl_3b")
        bd = concat_v2(f"{scope}/tower_1/mixed", [bda, bdb])
        bp = g.add(f"{scope}/tower_2/pool", pool_op, [x])
        bp = _conv_unit(g, rng, f"{scope}/tower_2/conv", bp, cin, 192, (1, 1), e, "branch_pool")
        return concat(f"{scope}/join", 3, [b1, b3, bd, bp]), 320 + 768 + 768 + 192

    x, c = block_a("mixed", x, 192, 32, "Mixed_5b")
    x, c = block_a("mixed_1", x, c, 64, "Mixed_5c")
    x, c = block_a("mixed_2", x, c, 64, "Mixed_5d")
    x, c = block_b("mixed_3", x, c, "Mixed_6a")
    x, c = block_c("mixed_4", x, c, 128, "Mixed_6b")
    x, c = block_c("mixed_5", x, c, 160, "Mixed_6c")
    x, c = block_c("mixed_6", x, c, 160, "Mixed_6d")
    x, c = block_c("mixed_7", x, c, 192, "Mixed_6e")
    x, c = block_d("mixed_8", x, c, "Mixed_7a")
    x, c = block_e("mixed_9", x, c, "Mixed_7b", "AvgPool")
    x, c = block_e("mixed_10", x, c, "Mixed_7c", "MaxPool")
    assert c == 2048

    # pool_3 -> reshape -> softmax matmul (+ bias, unused by the protocol)
    x = g.add("pool_3", "AvgPool", [x])
    g.const("pool_3/shape", np.asarray([-1, 2048], np.int32))
    x = g.add("pool_3/reshape", "Reshape", [x, "pool_3/shape"])
    fc = rng.normal(size=(2048, num_classes)).astype(np.float32)
    g.const("softmax/weights", fc)
    g.const("softmax/biases", rng.normal(size=num_classes).astype(np.float32))
    mm = g.add("softmax/logits/MatMul", "MatMul", [x, "softmax/weights"])
    g.add("softmax/logits", "BiasAdd", [mm, "softmax/biases"])
    g.add("softmax", "Softmax", ["softmax/logits"])

    expected = dict(expect)
    expected.update(blocks)
    expected["fc_kernel"] = fc
    return g.serialize(), {"params": expected}


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def graph_and_expected():
    return build_inception_graphdef(seed=0)


def test_extraction_is_exact(graph_and_expected):
    import jax

    data, expected = graph_and_expected
    got = tfg.extract_inception_params(data)
    exp_leaves = jax.tree_util.tree_flatten_with_path(expected)[0]
    got_flat = {jax.tree_util.keystr(k): v for k, v in
                jax.tree_util.tree_flatten_with_path(got)[0]}
    assert len(exp_leaves) == len(got_flat)
    # 5 stem convs + (3*7 + 4 + 4*10 + 6 + 2*9) block convs = 94 units
    assert sum(1 for k in got_flat if k.endswith("['kernel']")) == 94
    for key, value in exp_leaves:
        name = jax.tree_util.keystr(key)
        np.testing.assert_array_equal(got_flat[name], value, err_msg=name)


def test_epsilon_folding_and_scale_flag(graph_and_expected):
    data, expected = graph_and_expected
    got = tfg.extract_inception_params(data)["params"]
    exp = expected["params"]
    # conv_3 was written with variance_epsilon=0.002: folded into bn_var
    assert np.allclose(got["Conv2d_3b_1x1"]["bn_var"],
                       exp["Conv2d_3b_1x1"]["bn_var"])
    assert (exp["Conv2d_3b_1x1"]["bn_var"] > 0).all()
    # conv_1 used scale_after_normalization=True: gamma is NOT all-ones
    assert not np.allclose(got["Conv2d_2a_3x3"]["bn_scale"], 1.0)
    # conv (stem) used scale=False: gamma forced to ones
    np.testing.assert_array_equal(got["Conv2d_1a_3x3"]["bn_scale"],
                                  np.ones(32, np.float32))


def test_model_accepts_extracted_params(graph_and_expected):
    import jax
    import jax.numpy as jnp

    from maskbit_tpu.eval.inception import InceptionV3

    data, _ = graph_and_expected
    variables = tfg.extract_inception_params(data)
    variables = jax.tree.map(jnp.asarray, variables)
    model = InceptionV3()
    out = model.apply(variables, jnp.zeros((1, 64, 64, 3), jnp.float32))
    assert out["2048"].shape == (1, 2048)
    assert out["logits_unbiased"].shape == (1, 1008)
    assert np.isfinite(np.asarray(out["2048"])).all()


def test_shape_mismatch_raises():
    # `corrupt` bumps the named stem conv's output channels by one: the
    # extracted kernel/bn shapes no longer match the Flax tree
    data, _ = build_inception_graphdef(seed=1, corrupt="conv_3")
    with pytest.raises(ValueError):
        tfg.extract_inception_params(data)


def test_wire_parser_roundtrip_primitives():
    # broadcast-single float_val fills the declared shape (TF semantics)
    tensor = tfg._parse_tensor(_tensor_proto(
        np.full((2, 3), 1.5, np.float32), broadcast_single=True))
    np.testing.assert_array_equal(tensor, np.full((2, 3), 1.5, np.float32))
    # packed float_val
    arr = np.arange(6, dtype=np.float32).reshape(2, 3)
    np.testing.assert_array_equal(
        tfg._parse_tensor(_tensor_proto(arr, use_float_vals=True)), arr)
    # tensor_content int32
    iarr = np.asarray([299, 299], np.int32)
    np.testing.assert_array_equal(tfg._parse_tensor(_tensor_proto(iarr)), iarr)


def test_main_writes_loadable_msgpack(tmp_path, graph_and_expected):
    data, _ = graph_and_expected
    pb = tmp_path / "graph.pb"
    pb.write_bytes(data)
    out = tmp_path / "inception_adm.msgpack"
    tfg.main([str(pb), str(out)])

    from maskbit_tpu.core.checkpoint import load_pretrained

    loaded = load_pretrained(str(out))
    assert "params" in loaded and "Mixed_7c" in loaded["params"]


def test_adm_pb_env_wires_into_make_inception_fn(tmp_path, graph_and_expected,
                                                 monkeypatch):
    import jax.numpy as jnp

    from maskbit_tpu.cli.eval_tokenizer import make_inception_fn

    data, _ = graph_and_expected
    pb = tmp_path / "classify_image_graph_def.pb"
    pb.write_bytes(data)
    monkeypatch.setenv("MASKBIT_ADM_PB", str(pb))
    monkeypatch.delenv("MASKBIT_INCEPTION_WEIGHTS", raising=False)
    fn = make_inception_fn()
    assert fn is not None
    out = fn(jnp.zeros((1, 32, 32, 3), jnp.uint8))
    assert out["2048"].shape == (1, 2048)
