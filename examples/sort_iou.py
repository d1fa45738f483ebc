"""SORT with IoU metric (parity with /root/reference/python/sort/sort_iou.py)."""

from similari_tpu import (
    BoundingBox,
    PositionalMetricType,
    Sort,
    SpatioTemporalConstraints,
)

if __name__ == "__main__":
    constraints = SpatioTemporalConstraints()
    constraints.add_constraints([(1, 1.0)])
    sort = Sort(
        shards=4,
        bbox_history=10,
        max_idle_epochs=5,
        method=PositionalMetricType.iou(threshold=0.3),
        spatio_temporal_constraints=constraints,
        kalman_position_weight=0.1,
        kalman_velocity_weight=0.1,
    )

    box = BoundingBox(10.0, 5.0, 7.0, 7.0).as_xyaah()
    tracks = sort.predict([(box, 11111)])
    for t in tracks:
        print(t)
    sort.skip_epochs(10)

    wasted = sort.wasted()
    print(wasted[0])
    sort.clear_wasted()
