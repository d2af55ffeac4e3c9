import torch


def nms(boxes, scores, iou_threshold):
    """Plain O(n^2) NMS — reference semantics (xyxy boxes)."""
    order = scores.argsort(descending=True)
    keep = []
    while order.numel():
        i = order[0]
        keep.append(i.item())
        if order.numel() == 1:
            break
        rest = order[1:]
        xy1 = torch.maximum(boxes[i, :2], boxes[rest, :2])
        xy2 = torch.minimum(boxes[i, 2:], boxes[rest, 2:])
        inter = (xy2 - xy1).clamp(min=0).prod(1)
        area_i = (boxes[i, 2:] - boxes[i, :2]).clamp(min=0).prod(0)
        area_r = (boxes[rest, 2:] - boxes[rest, :2]).clamp(min=0).prod(1)
        iou = inter / (area_i + area_r - inter + 1e-12)
        order = rest[iou <= iou_threshold]
    return torch.as_tensor(keep, dtype=torch.long)


def box_iou(boxes1, boxes2):
    a1 = (boxes1[:, 2:] - boxes1[:, :2]).clamp(min=0).prod(1)
    a2 = (boxes2[:, 2:] - boxes2[:, :2]).clamp(min=0).prod(1)
    xy1 = torch.maximum(boxes1[:, None, :2], boxes2[None, :, :2])
    xy2 = torch.minimum(boxes1[:, None, 2:], boxes2[None, :, 2:])
    inter = (xy2 - xy1).clamp(min=0).prod(2)
    return inter / (a1[:, None] + a2[None, :] - inter + 1e-12)
