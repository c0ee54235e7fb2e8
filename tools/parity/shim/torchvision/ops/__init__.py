from .boxes import box_area, box_iou  # noqa: F401


def _new_empty_tensor(x, shape):
    return x.new_empty(shape)
