"""Kalman box filter demo (parity with /root/reference/python/kalman_bbox.py)."""

from similari_tpu import BoundingBox, Universal2DBox, Universal2DBoxKalmanFilter

if __name__ == "__main__":
    f = Universal2DBoxKalmanFilter()
    state = f.initiate(BoundingBox(0.0, 0.0, 5.0, 10.0).as_xyaah())
    for step in range(5):
        state = f.predict(state)
        print("pred", state.universal_bbox())
        meas = Universal2DBox.ltwh(0.2 * (step + 1), 0.3 * (step + 1), 5.0, 10.0)
        state = f.update(state, meas)

    dist = f.distance(state, Universal2DBox.ltwh(1.0, 1.5, 5.0, 10.0))
    print("gating distance", dist, "cost", f.calculate_cost(dist, False))
