// No-op stand-in for cpu_tsdf::TSDFVolumeOctree.  The reference constructs
// and configures the volume unconditionally (FullSystem.cpp:192-198) but the
// actual integration call is commented out upstream, so a configured no-op
// preserves behavior exactly.
#pragma once
#include <memory>

namespace cpu_tsdf {

class TSDFVolumeOctree {
 public:
  using Ptr = std::shared_ptr<TSDFVolumeOctree>;
  void setGridSize(double, double, double) {}
  void setResolution(int, int, int) {}
  void setIntegrateColor(bool) {}
  void setImageSize(int, int) {}
  void setCameraIntrinsics(double, double, double, double) {}
  void reset() {}
};

}  // namespace cpu_tsdf
