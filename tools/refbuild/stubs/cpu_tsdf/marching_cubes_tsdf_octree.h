#pragma once
#include <cpu_tsdf/tsdf_volume_octree.h>

namespace cpu_tsdf {
class MarchingCubesTSDFOctree {};
}  // namespace cpu_tsdf
