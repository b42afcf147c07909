// Empty stub: all g2o usage in the reference is commented out (VertexDefine.h).
#pragma once
