#pragma once
#include <cpu_tsdf/tsdf_volume_octree.h>
