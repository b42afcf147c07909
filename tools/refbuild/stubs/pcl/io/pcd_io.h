// Functional ASCII PCD writer (xyz fields only) so saveCloudfile-style
// exports still produce inspectable output under the stub build.
#pragma once
#include <cstdio>
#include <string>
#include <pcl/point_types.h>

namespace pcl {
namespace io {

template <class PointT>
inline int savePCDFileASCII(const std::string& path, const PointCloud<PointT>& cloud) {
  std::FILE* f = std::fopen(path.c_str(), "w");
  if (!f) return -1;
  std::fprintf(f,
               "# .PCD v0.7 - Point Cloud Data file format\nVERSION 0.7\n"
               "FIELDS x y z\nSIZE 4 4 4\nTYPE F F F\nCOUNT 1 1 1\n"
               "WIDTH %zu\nHEIGHT 1\nVIEWPOINT 0 0 0 1 0 0 0\nPOINTS %zu\nDATA ascii\n",
               cloud.size(), cloud.size());
  for (const auto& p : cloud.points) std::fprintf(f, "%f %f %f\n", p.x, p.y, p.z);
  std::fclose(f);
  return 0;
}

template <class PointT>
inline int savePCDFile(const std::string& path, const PointCloud<PointT>& cloud,
                       bool /*binary*/ = false) {
  return savePCDFileASCII(path, cloud);
}

}  // namespace io
}  // namespace pcl
