#pragma once
namespace pcl {
const int SAC_RANSAC = 0;
const int SAC_LMEDS = 1;
const int SAC_MSAC = 2;
}  // namespace pcl
