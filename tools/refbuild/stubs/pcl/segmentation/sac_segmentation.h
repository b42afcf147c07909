// Functional plane-RANSAC stand-in for pcl::SACSegmentation (plane model
// only — the only model the reference requests).  Deterministic LCG sampler;
// optional least-squares refinement on the inlier set when
// setOptimizeCoefficients(true), mirroring PCL's behavior closely enough
// for the dense-frontend plane fits to work.
#pragma once
#include <cmath>
#include <cstdint>
#include <pcl/ModelCoefficients.h>
#include <pcl/point_types.h>
#include <pcl/sample_consensus/method_types.h>
#include <pcl/sample_consensus/model_types.h>

namespace pcl {

template <class PointT>
class SACSegmentation {
 public:
  void setOptimizeCoefficients(bool v) { optimize_ = v; }
  void setModelType(int m) { model_ = m; }
  void setMethodType(int m) { method_ = m; }
  void setDistanceThreshold(double t) { thresh_ = t; }
  void setMaxIterations(int n) { max_iters_ = n; }
  void setInputCloud(typename PointCloud<PointT>::ConstPtr c) { cloud_ = c; }

  void segment(PointIndices& inliers, ModelCoefficients& coeffs) {
    inliers.indices.clear();
    coeffs.values.assign(4, 0.f);
    if (!cloud_ || cloud_->size() < 3) return;
    const auto& pts = cloud_->points;
    const int n = (int)pts.size();

    std::uint64_t rng = 0x9e3779b97f4a7c15ull;  // fixed seed: deterministic fits
    auto nexti = [&rng, n]() {
      rng = rng * 6364136223846793005ull + 1442695040888963407ull;
      return (int)((rng >> 33) % (std::uint64_t)n);
    };

    double bn[3] = {0, 0, 0}, bd = 0;
    int best = -1;
    for (int it = 0; it < max_iters_; ++it) {
      int i0 = nexti(), i1 = nexti(), i2 = nexti();
      if (i0 == i1 || i1 == i2 || i0 == i2) continue;
      double ux = pts[i1].x - pts[i0].x, uy = pts[i1].y - pts[i0].y, uz = pts[i1].z - pts[i0].z;
      double vx = pts[i2].x - pts[i0].x, vy = pts[i2].y - pts[i0].y, vz = pts[i2].z - pts[i0].z;
      double nx = uy * vz - uz * vy, ny = uz * vx - ux * vz, nz = ux * vy - uy * vx;
      double nn = std::sqrt(nx * nx + ny * ny + nz * nz);
      if (nn < 1e-12) continue;
      nx /= nn; ny /= nn; nz /= nn;
      double d = -(nx * pts[i0].x + ny * pts[i0].y + nz * pts[i0].z);
      int cnt = 0;
      for (int k = 0; k < n; ++k)
        if (std::fabs(nx * pts[k].x + ny * pts[k].y + nz * pts[k].z + d) < thresh_) ++cnt;
      if (cnt > best) { best = cnt; bn[0] = nx; bn[1] = ny; bn[2] = nz; bd = d; }
    }
    if (best < 3) return;

    if (optimize_) refine(bn, bd);

    for (int k = 0; k < n; ++k)
      if (std::fabs(bn[0] * pts[k].x + bn[1] * pts[k].y + bn[2] * pts[k].z + bd) < thresh_)
        inliers.indices.push_back(k);
    coeffs.values[0] = (float)bn[0];
    coeffs.values[1] = (float)bn[1];
    coeffs.values[2] = (float)bn[2];
    coeffs.values[3] = (float)bd;
  }

 private:
  // Least-squares plane through the current inliers: normal = smallest
  // eigenvector of the 3x3 scatter (closed-form via cross-product deflation).
  void refine(double bn[3], double& bd) {
    const auto& pts = cloud_->points;
    const int n = (int)pts.size();
    double cx = 0, cy = 0, cz = 0;
    int m = 0;
    for (int k = 0; k < n; ++k) {
      if (std::fabs(bn[0] * pts[k].x + bn[1] * pts[k].y + bn[2] * pts[k].z + bd) >= thresh_)
        continue;
      cx += pts[k].x; cy += pts[k].y; cz += pts[k].z; ++m;
    }
    if (m < 3) return;
    cx /= m; cy /= m; cz /= m;
    double xx = 0, xy = 0, xz = 0, yy = 0, yz = 0, zz = 0;
    for (int k = 0; k < n; ++k) {
      if (std::fabs(bn[0] * pts[k].x + bn[1] * pts[k].y + bn[2] * pts[k].z + bd) >= thresh_)
        continue;
      double dx = pts[k].x - cx, dy = pts[k].y - cy, dz = pts[k].z - cz;
      xx += dx * dx; xy += dx * dy; xz += dx * dz;
      yy += dy * dy; yz += dy * dz; zz += dz * dz;
    }
    // Normal minimizes scatter: pick the most stable of the three cofactor rows.
    double detx = yy * zz - yz * yz, dety = xx * zz - xz * xz, detz = xx * yy - xy * xy;
    double nx, ny, nz;
    if (detx >= dety && detx >= detz) { nx = detx; ny = xz * yz - xy * zz; nz = xy * yz - xz * yy; }
    else if (dety >= detz) { nx = xz * yz - xy * zz; ny = dety; nz = xy * xz - yz * xx; }
    else { nx = xy * yz - xz * yy; ny = xy * xz - yz * xx; nz = detz; }
    double nn = std::sqrt(nx * nx + ny * ny + nz * nz);
    if (nn < 1e-12) return;
    nx /= nn; ny /= nn; nz /= nn;
    // Keep orientation consistent with the RANSAC hypothesis.
    if (nx * bn[0] + ny * bn[1] + nz * bn[2] < 0) { nx = -nx; ny = -ny; nz = -nz; }
    bn[0] = nx; bn[1] = ny; bn[2] = nz;
    bd = -(nx * cx + ny * cy + nz * cz);
  }

  typename PointCloud<PointT>::ConstPtr cloud_;
  bool optimize_ = false;
  int model_ = SACMODEL_PLANE, method_ = SAC_RANSAC, max_iters_ = 200;
  double thresh_ = 0.01;
};

}  // namespace pcl
