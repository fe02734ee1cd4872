"""Numpy oracle for the XYAH/XYWH/XYSR Kalman recursions.

Mirrors the reference math (boxmot/motion/kalman_filters/base.py:234-358
with the subclass std functions) in float64 for comparison against the
float32 batched bank in boxmot_tpu.motion.kalman.
"""

import numpy as np

SWP = 1.0 / 20
SWV = 1.0 / 160


def cv_motion_mat(dz):
    F = np.eye(2 * dz)
    for i in range(dz):
        F[i, dz + i] = 1.0
    return F


class XYAHOracle:
    dz = 4

    def __init__(self):
        self.F = cv_motion_mat(4)

    def initiate(self, z):
        mean = np.r_[z, np.zeros(4)]
        h = z[3]
        std = [
            2 * SWP * h, 2 * SWP * h, 1e-2, 2 * SWP * h,
            10 * SWV * h, 10 * SWV * h, 1e-5, 10 * SWV * h,
        ]
        mean[2] = max(mean[2], 1e-4)
        mean[3] = max(mean[3], 1e-4)
        return mean, np.diag(np.square(std))

    def predict(self, mean, cov):
        h = mean[3]
        std = [SWP * h, SWP * h, 1e-2, SWP * h, SWV * h, SWV * h, 1e-5, SWV * h]
        Q = np.diag(np.square(std))
        mean = self.F @ mean
        cov = self.F @ cov @ self.F.T + Q
        mean[2] = max(mean[2], 1e-4)
        mean[3] = max(mean[3], 1e-4)
        return mean, cov

    def update(self, mean, cov, z, confidence=0.0, nsa=False):
        h = mean[3]
        std = np.array([SWP * h, SWP * h, 1e-1, SWP * h])
        if nsa:
            std = (1 - confidence) * std
        R = np.diag(np.square(std))
        H = np.eye(4, 8)
        S = H @ cov @ H.T + R
        K = cov @ H.T @ np.linalg.inv(S)
        innov = z - H @ mean
        new_mean = mean + K @ innov
        new_cov = cov - K @ S @ K.T
        new_mean[2] = max(new_mean[2], 1e-4)
        new_mean[3] = max(new_mean[3], 1e-4)
        return new_mean, new_cov

    def gating_distance(self, mean, cov, measurements):
        h = mean[3]
        std = np.array([SWP * h, SWP * h, 1e-1, SWP * h])
        R = np.diag(np.square(std))
        H = np.eye(4, 8)
        S = H @ cov @ H.T + R
        d = measurements - (H @ mean)[None, :]
        Sinv = np.linalg.inv(S)
        return np.einsum("nz,zy,ny->n", d, Sinv, d)
