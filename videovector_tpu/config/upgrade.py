"""Legacy (V0) prototxt upgrade.

ref:src/caffe/util/upgrade_proto.cpp (637 LoC): V0 nets wrap per-layer params
in a nested `layer { ... }` message with string types and flat fields
(num_output, kernelsize, ...), and express padding as separate `padding`
layers. `upgrade_net` converts to the V1 form this framework's graph engine
consumes: enum-style type names, per-type `*_param` sub-messages, padding
folded into the following conv's `pad` field.
"""

from __future__ import annotations

from videovector_tpu.config.textformat import Message

# V0 string type → V1 enum name (ref UpgradeV0LayerType)
_TYPE_MAP = {
    "accuracy": "ACCURACY", "bnll": "BNLL", "concat": "CONCAT",
    "conv": "CONVOLUTION", "data": "DATA", "dropout": "DROPOUT",
    "euclidean_loss": "EUCLIDEAN_LOSS", "flatten": "FLATTEN",
    "hdf5_data": "HDF5_DATA", "hdf5_output": "HDF5_OUTPUT",
    "im2col": "IM2COL", "images": "IMAGE_DATA", "infogain_loss": "INFOGAIN_LOSS",
    "innerproduct": "INNER_PRODUCT", "lrn": "LRN",
    "multinomial_logistic_loss": "MULTINOMIAL_LOGISTIC_LOSS",
    "pool": "POOLING", "relu": "RELU", "sigmoid": "SIGMOID",
    "softmax": "SOFTMAX", "softmax_loss": "SOFTMAX_LOSS", "split": "SPLIT",
    "tanh": "TANH", "window_data": "WINDOW_DATA",
}

# V0 flat field → (v1 param message, v1 field) per type family
_FIELD_MAP = {
    "num_output": ("inner_product_param|convolution_param", "num_output"),
    "biasterm": ("inner_product_param|convolution_param", "bias_term"),
    "kernelsize": ("convolution_param|pooling_param", "kernel_size"),
    "stride": ("convolution_param|pooling_param", "stride"),
    "pad": ("convolution_param|pooling_param", "pad"),
    "group": ("convolution_param", "group"),
    "pool": ("pooling_param", "pool"),
    "dropout_ratio": ("dropout_param", "dropout_ratio"),
    "local_size": ("lrn_param", "local_size"),
    "alpha": ("lrn_param", "alpha"),
    "beta": ("lrn_param", "beta"),
    "source": ("data_param", "source"),
    "batchsize": ("data_param", "batch_size"),
    "scale": ("transform_param", "scale"),
    "cropsize": ("transform_param", "crop_size"),
    "mirror": ("transform_param", "mirror"),
    "meanfile": ("transform_param", "mean_file"),
}

_CONV_TYPES = {"CONVOLUTION", "IM2COL"}
_POOL_TYPES = {"POOLING"}
_IP_TYPES = {"INNER_PRODUCT"}


def net_needs_upgrade(net_msg: Message) -> bool:
    """ref NetNeedsUpgrade: any layers entry with a nested `layer` message."""
    return any(isinstance(l.get("layer"), Message)
               for l in net_msg.get_list("layers"))


def _param_target(choices: str, v1_type: str) -> str:
    opts = choices.split("|")
    if len(opts) == 1:
        return opts[0]
    if v1_type in _CONV_TYPES:
        return "convolution_param"
    if v1_type in _POOL_TYPES:
        return "pooling_param"
    return opts[0]


def upgrade_layer(conn: Message) -> Message:
    """One V0 `layers { layer {...} bottom... top... }` connection → V1."""
    v0 = conn.get_msg("layer")
    out = Message()
    for b in conn.get_list("bottom"):
        out.add("bottom", b)
    for t in conn.get_list("top"):
        out.add("top", t)
    if v0.has("name"):
        out.add("name", v0.get("name"))
    v0_type = str(v0.get("type", ""))
    v1_type = _TYPE_MAP.get(v0_type, v0_type.upper())
    out.add("type", v1_type)

    params: dict[str, Message] = {}
    for field, vals in v0.fields.items():
        if field in ("name", "type"):
            continue
        if field in ("blobs_lr", "weight_decay", "blobs"):
            for v in vals:
                out.add(field, v)
            continue
        if field in ("weight_filler", "bias_filler"):
            tgt = _param_target("inner_product_param|convolution_param",
                                v1_type)
            params.setdefault(tgt, Message())
            for v in vals:
                params[tgt].add(field, v)
            continue
        if field in _FIELD_MAP:
            choices, v1_field = _FIELD_MAP[field]
            tgt = _param_target(choices, v1_type)
            params.setdefault(tgt, Message())
            for v in vals:
                params[tgt].add(v1_field, v)
            continue
        # unknown fields pass through at top level
        for v in vals:
            out.add(field, v)
    for pname, pmsg in params.items():
        out.add(pname, pmsg)
    return out


def upgrade_net(net_msg: Message) -> Message:
    """ref UpgradeV0Net + UpgradeV0PaddingLayers: fold `padding` layers into
    the following conv's pad and convert every layer."""
    if not net_needs_upgrade(net_msg):
        return net_msg
    out = Message()
    if net_msg.has("name"):
        out.add("name", net_msg.get("name"))
    for f in ("input", "input_dim"):
        for v in net_msg.get_list(f):
            out.add(f, v)

    # pass 1: record padding layers (top name → pad amount)
    pad_by_top: dict[str, int] = {}
    layers = net_msg.get_list("layers")
    for conn in layers:
        v0 = conn.get_msg("layer")
        if str(v0.get("type", "")) == "padding":
            for t in conn.get_list("top"):
                pad_by_top[str(t)] = int(v0.get("pad", 0))

    # pass 2: convert, rewiring conv bottoms that consumed a padding top
    for conn in layers:
        v0 = conn.get_msg("layer")
        if str(v0.get("type", "")) == "padding":
            continue
        upgraded = upgrade_layer(conn)
        new_bottoms = []
        pad_amount = None
        for b in upgraded.get_list("bottom"):
            if str(b) in pad_by_top:
                pad_amount = pad_by_top[str(b)]
                # find the padding layer's own bottom
                for pconn in layers:
                    if str(b) in [str(t) for t in pconn.get_list("top")] and \
                            str(pconn.get_msg("layer").get("type", "")) == "padding":
                        new_bottoms.extend(
                            str(x) for x in pconn.get_list("bottom"))
                        break
            else:
                new_bottoms.append(str(b))
        if pad_amount is not None:
            upgraded.fields["bottom"] = new_bottoms
            conv_param = upgraded.get_msg("convolution_param")
            conv_param.fields["pad"] = [pad_amount]
            upgraded.fields["convolution_param"] = [conv_param]
        out.add("layers", upgraded)
    return out
