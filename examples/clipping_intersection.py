"""Polygon clipping demo (parity with /root/reference/python/clipping_intersection.py)."""

from similari_tpu import BoundingBox, intersection_area, sutherland_hodgman_clip

if __name__ == "__main__":
    bbox1 = BoundingBox(0.0, 0.0, 5.0, 10.0).as_xyaah()
    bbox2 = BoundingBox(0.0, 0.0, 10.0, 5.0).as_xyaah()
    clip = sutherland_hodgman_clip(bbox1, bbox2)
    print(clip)
    print("Intersection area:", intersection_area(bbox1, bbox2))

    bbox2 = BoundingBox(0.0, 0.0, 5.0, 10.0).as_xyaah()
    bbox2.rotate(0.5)
    clip = sutherland_hodgman_clip(bbox1, bbox2)
    print(clip)
    print("Intersection area:", intersection_area(bbox1, bbox2))
