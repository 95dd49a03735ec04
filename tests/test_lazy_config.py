"""LazyCall / instantiate / AST-deferral parity with the reference registry
(/root/reference/util/lazy_load.py)."""

import functools

import pytest

from salience_detr_tpu.utils.config import Config
from salience_detr_tpu.utils.lazy import (
    LazyCall,
    LazySpec,
    instantiate,
    locate,
    target_string,
)


class Widget:
    def __init__(self, size, color="red", parts=()):
        self.size, self.color, self.parts = size, color, tuple(parts)


def variadic(base, *extras, scale=1):
    return (base + sum(extras)) * scale


def test_capture_and_instantiate():
    spec = LazyCall(Widget)(size=3, color="blue")
    assert isinstance(spec, LazySpec) and spec["_target_"] is Widget
    w = instantiate(spec)
    assert (w.size, w.color) == (3, "blue")


def test_edit_after_capture():
    spec = LazyCall(Widget)(size=3)
    spec.size = 7  # attribute-style edit, as in the reference docstring
    assert instantiate(spec).size == 7


def test_positional_folding_and_varargs():
    assert instantiate(LazyCall(Widget)(5, "green")).color == "green"
    assert instantiate(LazyCall(variadic)(1, 2, 3, scale=10)) == 60
    with pytest.raises(TypeError):
        LazyCall(Widget)(5, size=5)  # duplicate positional/keyword


def test_recursive_graph_and_lists():
    spec = LazyCall(Widget)(
        size=1,
        parts=[LazyCall(Widget)(size=2), LazyCall(Widget)(size=3)],
    )
    w = instantiate(spec)
    assert [p.size for p in w.parts] == [2, 3]


def test_string_target_and_locate_roundtrip():
    path = target_string(Widget)
    assert locate(path) is Widget
    spec = LazySpec({"_target_": "collections.OrderedDict", "a": 1})
    assert dict(instantiate(spec)) == {"a": 1}


def test_config_lazy_and_partial_assignments(tmp_path):
    cfg_file = tmp_path / "cfg.py"
    cfg_file.write_text(
        "from tests.test_lazy_config import Widget, variadic\n"
        "model = Widget(4, color='teal')\n"
        "optimizer = variadic(10, scale=2)\n"
        "eager = variadic(1, 1)\n"
    )
    cfg = Config(str(cfg_file), lazy=("model",), partials=("optimizer",))
    assert isinstance(cfg.model, LazySpec)
    assert instantiate(cfg.model).color == "teal"
    assert isinstance(cfg.optimizer, functools.partial)
    assert cfg.optimizer() == 20
    assert cfg.eager == 2  # untouched assignments still execute eagerly
