// Functional stand-in for pcl::PassThrough (x/y/z field box filter).
// Supports filtering in-place (output cloud == input cloud), which the
// reference relies on (MapPoint.cpp:92-94).
#pragma once
#include <string>
#include <vector>
#include <pcl/point_types.h>

namespace pcl {

template <class PointT>
class PassThrough {
 public:
  void setInputCloud(typename PointCloud<PointT>::ConstPtr c) { cloud_ = c; }
  void setFilterFieldName(const std::string& f) { field_ = f; }
  void setFilterLimits(float lo, float hi) { lo_ = lo; hi_ = hi; }
  void setNegative(bool v) { negative_ = v; }

  void filter(PointCloud<PointT>& out) {
    std::vector<PointT> kept;
    if (cloud_) {
      kept.reserve(cloud_->size());
      const int axis = field_ == "x" ? 0 : field_ == "y" ? 1 : 2;
      for (const auto& p : cloud_->points) {
        const float v = axis == 0 ? p.x : axis == 1 ? p.y : p.z;
        const bool in = v >= lo_ && v <= hi_;
        if (in != negative_) kept.push_back(p);
      }
    }
    out.points.swap(kept);
    out.width = (std::uint32_t)out.points.size();
    out.height = 1;
  }

 private:
  typename PointCloud<PointT>::ConstPtr cloud_;
  std::string field_ = "z";
  float lo_ = 0.f, hi_ = 0.f;
  bool negative_ = false;
};

}  // namespace pcl
