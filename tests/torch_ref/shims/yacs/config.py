import copy


class CfgNode(dict):
    """Attribute-style dict with the handful of yacs methods the
    reference code calls."""

    IMMUTABLE = "__immutable__"

    def __init__(self, init_dict=None, **kwargs):
        init_dict = {} if init_dict is None else dict(init_dict)
        init_dict.update(kwargs)
        for k, v in init_dict.items():
            if isinstance(v, dict) and not isinstance(v, CfgNode):
                init_dict[k] = CfgNode(v)
        super().__init__(init_dict)

    def __getattr__(self, name):
        try:
            return self[name]
        except KeyError:
            raise AttributeError(name)

    def __setattr__(self, name, value):
        self[name] = value

    def clone(self):
        return copy.deepcopy(self)

    def merge_from_other_cfg(self, other):
        _merge(other, self)

    def merge_from_list(self, opts):
        for k, v in zip(opts[0::2], opts[1::2]):
            node = self
            parts = k.split(".")
            for p in parts[:-1]:
                node = node[p]
            node[parts[-1]] = v

    def freeze(self):
        pass

    def defrost(self):
        pass

    def is_frozen(self):
        return False


def _merge(src, dst):
    for k, v in src.items():
        if isinstance(v, dict) and isinstance(dst.get(k), dict):
            _merge(v, dst[k])
        else:
            dst[k] = v
