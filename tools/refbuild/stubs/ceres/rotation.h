// Real implementations of the two rotation helpers the reference's functors
// use (standard Rodrigues formulas).
#pragma once
#include <cmath>

namespace ceres {

template <typename T>
inline void AngleAxisRotatePoint(const T angle_axis[3], const T pt[3], T result[3]) {
  const T theta2 = angle_axis[0] * angle_axis[0] + angle_axis[1] * angle_axis[1] +
                   angle_axis[2] * angle_axis[2];
  if (theta2 > T(1e-16)) {
    const T theta = sqrt(theta2);
    const T c = cos(theta), s = sin(theta);
    const T inv = T(1.0) / theta;
    const T w[3] = {angle_axis[0] * inv, angle_axis[1] * inv, angle_axis[2] * inv};
    const T wxp[3] = {w[1] * pt[2] - w[2] * pt[1], w[2] * pt[0] - w[0] * pt[2],
                      w[0] * pt[1] - w[1] * pt[0]};
    const T dot = (w[0] * pt[0] + w[1] * pt[1] + w[2] * pt[2]) * (T(1.0) - c);
    for (int i = 0; i < 3; ++i) result[i] = pt[i] * c + wxp[i] * s + w[i] * dot;
  } else {
    const T wxp[3] = {angle_axis[1] * pt[2] - angle_axis[2] * pt[1],
                      angle_axis[2] * pt[0] - angle_axis[0] * pt[2],
                      angle_axis[0] * pt[1] - angle_axis[1] * pt[0]};
    for (int i = 0; i < 3; ++i) result[i] = pt[i] + wxp[i];
  }
}

// Column-major 3x3, matching Ceres's default MatrixAdapter for this overload.
template <typename T>
inline void AngleAxisToRotationMatrix(const T angle_axis[3], T R[9]) {
  const T theta2 = angle_axis[0] * angle_axis[0] + angle_axis[1] * angle_axis[1] +
                   angle_axis[2] * angle_axis[2];
  if (theta2 > T(1e-16)) {
    const T theta = sqrt(theta2);
    const T inv = T(1.0) / theta;
    const T wx = angle_axis[0] * inv, wy = angle_axis[1] * inv, wz = angle_axis[2] * inv;
    const T c = cos(theta), s = sin(theta), c1 = T(1.0) - c;
    R[0] = c + wx * wx * c1;      R[1] = wz * s + wx * wy * c1;  R[2] = -wy * s + wx * wz * c1;
    R[3] = wx * wy * c1 - wz * s; R[4] = c + wy * wy * c1;       R[5] = wx * s + wy * wz * c1;
    R[6] = wy * s + wx * wz * c1; R[7] = -wx * s + wy * wz * c1; R[8] = c + wz * wz * c1;
  } else {
    R[0] = T(1); R[1] = angle_axis[2]; R[2] = -angle_axis[1];
    R[3] = -angle_axis[2]; R[4] = T(1); R[5] = angle_axis[0];
    R[6] = angle_axis[1]; R[7] = -angle_axis[0]; R[8] = T(1);
  }
}

}  // namespace ceres
