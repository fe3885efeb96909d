"""Render-function layer: the public API boundary mirroring the reference's
``gaussian_renderer/__init__.py`` render_fn_dict."""

from svgir_tpu.render.stage1 import render_stage1  # noqa: F401

render_fn_dict = {
    "render": render_stage1,
}

try:  # stage-2 registered once available
    from svgir_tpu.render.svgss import render_svgss  # noqa: F401
    render_fn_dict["render_relight"] = render_svgss
except ImportError:
    pass
