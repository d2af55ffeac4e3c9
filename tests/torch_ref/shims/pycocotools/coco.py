class COCO:
    def __init__(self, *a, **k):
        raise NotImplementedError("pycocotools shim: datasets unavailable")
