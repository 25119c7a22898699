from unipose_tpu.viz.draw import draw_paint, get_kpts, heatmap_overlays  # noqa: F401
