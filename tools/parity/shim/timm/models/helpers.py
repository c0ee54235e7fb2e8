import torch


def named_apply(fn, module, name="", depth_first=True, include_root=False):
    if not depth_first and include_root:
        fn(module=module, name=name)
    for child_name, child_module in module.named_children():
        child_full = f"{name}.{child_name}" if name else child_name
        named_apply(fn, child_module, name=child_full, depth_first=depth_first,
                    include_root=True)
    if depth_first and include_root:
        fn(module=module, name=name)
    return module


def adapt_input_conv(in_chans, conv_weight):
    conv_type = conv_weight.dtype
    conv_weight = conv_weight.float()
    O, I, J, K = conv_weight.shape
    if in_chans == 1:
        conv_weight = conv_weight.sum(dim=1, keepdim=True)
    elif in_chans != 3:
        repeat = in_chans // 3 + 1
        conv_weight = conv_weight.repeat(1, repeat, 1, 1)[:, :in_chans]
        conv_weight *= 3 / float(in_chans)
    return conv_weight.to(conv_type)


def build_model_with_cfg(*args, **kwargs):
    raise NotImplementedError(
        "timm shim: build_model_with_cfg is not needed by the reference "
        "tracker build paths; if you hit this, instantiate the model class "
        "directly.")
