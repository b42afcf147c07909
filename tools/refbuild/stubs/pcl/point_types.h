// Minimal functional stand-in for the subset of PCL the reference uses.
// PointCloud is a real container; RANSAC/PassThrough (see segmentation/,
// filters/) are real implementations so dense mode stays functional.
#pragma once
#include <cstdint>
#include <cstddef>
#include <memory>
#include <vector>

namespace pcl {

struct PointXYZ {
  float x = 0.f, y = 0.f, z = 0.f;
  PointXYZ() = default;
  PointXYZ(float x_, float y_, float z_) : x(x_), y(y_), z(z_) {}
};

struct PointXYZRGBA {
  float x = 0.f, y = 0.f, z = 0.f;
  std::uint8_t b = 0, g = 0, r = 0, a = 255;
  PointXYZRGBA() = default;
};

struct Normal {
  float normal_x = 0.f, normal_y = 0.f, normal_z = 0.f, curvature = 0.f;
};

template <class PointT>
struct PointCloud {
  using Ptr = std::shared_ptr<PointCloud<PointT>>;
  using ConstPtr = std::shared_ptr<const PointCloud<PointT>>;
  using iterator = typename std::vector<PointT>::iterator;
  using const_iterator = typename std::vector<PointT>::const_iterator;

  std::vector<PointT> points;
  std::uint32_t width = 0, height = 1;
  bool is_dense = true;

  std::size_t size() const { return points.size(); }
  bool empty() const { return points.empty(); }
  void clear() { points.clear(); width = 0; }
  void resize(std::size_t n) { points.resize(n); width = (std::uint32_t)n; }
  void push_back(const PointT& p) { points.push_back(p); width = (std::uint32_t)points.size(); }
  PointT& operator[](std::size_t i) { return points[i]; }
  const PointT& operator[](std::size_t i) const { return points[i]; }
  PointT& at(std::size_t i) { return points.at(i); }
  const PointT& at(std::size_t i) const { return points.at(i); }
  iterator begin() { return points.begin(); }
  iterator end() { return points.end(); }
  const_iterator begin() const { return points.begin(); }
  const_iterator end() const { return points.end(); }
  Ptr makeShared() const { return std::make_shared<PointCloud<PointT>>(*this); }
};

struct PointIndices {
  using Ptr = std::shared_ptr<PointIndices>;
  std::vector<int> indices;
};

struct ModelCoefficients {
  using Ptr = std::shared_ptr<ModelCoefficients>;
  std::vector<float> values;
};

}  // namespace pcl
