"""Empty pycocotools stand-in: the parity harness never evaluates COCO
datasets, but reference import chains touch the package."""
