"""2D point Kalman filter demo (parity with /root/reference/python/kalman_2d_point.py)."""

from similari_tpu import Point2DKalmanFilter

if __name__ == "__main__":
    f = Point2DKalmanFilter()
    state = f.initiate(0.0, 0.0)
    for i in range(1, 6):
        state = f.predict(state)
        print("pred", state.x(), state.y())
        state = f.update(state, 0.5 * i, 0.3 * i)
    print("final", state.x(), state.y())
