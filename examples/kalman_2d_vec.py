"""Vectorized keypoint Kalman filter demo (parity with /root/reference/python/kalman_2d_vec.py)."""

from similari_tpu import Vec2DKalmanFilter

if __name__ == "__main__":
    f = Vec2DKalmanFilter()
    states = f.initiate([(0.0, 0.0), (10.0, 10.0), (20.0, 5.0)])
    for i in range(1, 4):
        states = f.predict(states)
        pts = [(0.5 * i, 0.3 * i), (10.0 + i, 10.0), (20.0, 5.0 + 0.5 * i)]
        states = f.update(states, pts)
        print([(s.x(), s.y()) for s in states])
