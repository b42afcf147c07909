#pragma once
namespace pcl {
const int SACMODEL_PLANE = 0;
const int SACMODEL_LINE = 1;
}  // namespace pcl
