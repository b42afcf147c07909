// Headless driver for the reference NALO-SLAM library (parity runs).
//
// The reference's own main (src/main_dso_pangolin.cpp) hard-requires
// Pangolin + backward-cpp; this driver reproduces its behavioral contract
// for offline evaluation without a GUI:
//   * key=value args: files/calib/gamma/vignette/masks/color/preset/mode/
//     start/end/dense/planeOpt/densemap/tsdf/quiet/output
//   * settingsDefault preset table (main_dso_pangolin.cpp:100-181)
//   * mode= photometric-calibration selector (:421-445)
//   * sequential playback (playbackSpeed=0 -> linearizeOperation), reset on
//     initFailed within the first 250 frames (:596-616), isLost abort
//   * TUM-format trajectory via FullSystem::printResult (:631) and an
//     fps summary (:638-649)
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <sys/time.h>

#include "util/settings.h"
#include "util/DatasetReader.h"
#include "util/globalCalib.h"
#include "util/NumType.h"
#include "FullSystem/FullSystem.h"
#include "IOWrapper/Output3DWrapper.h"

using namespace dso;

static std::string a_files, a_calib, a_gamma, a_vignette, a_masks, a_colors;
static std::string a_output = "result.txt";
static int a_preset = 0, a_mode = 0, a_start = 0, a_end = 100000;

static void applyPreset(int preset) {
  // Mirrors settingsDefault (main_dso_pangolin.cpp:100-181), minus
  // real-time pacing: parity runs are always sequential (playbackSpeed=0).
  if (preset == 0 || preset == 1) {
    setting_desiredImmatureDensity = 4000;
    setting_desiredPointDensity = 5000;
    setting_minFrames = 5;
    setting_maxFrames = 7;
    setting_maxOptIterations = 6;
    setting_minOptIterations = 1;
  } else if (preset == 2 || preset == 3) {
    setting_desiredImmatureDensity = 600;
    setting_desiredPointDensity = 800;
    setting_minFrames = 4;
    setting_maxFrames = 6;
    setting_maxOptIterations = 4;
    setting_minOptIterations = 1;
    benchmarkSetting_width = 424;
    benchmarkSetting_height = 320;
  }
  if (preset == 4 || preset == 5) {
    if (preset == 5) {
      setting_desiredImmatureDensity = 4000;
      setting_desiredPointDensity = 5000;
    } else {
      setting_useLidar = 0;
      setting_desiredImmatureDensity = 1500;
      setting_desiredPointDensity = 2000;
    }
    setting_minFrames = 5;
    setting_maxFrames = 7;
    setting_maxOptIterations = 6;
    setting_minOptIterations = 1;
  }
  // (logStuff is NOT touched here: the nolog= arg controls it, and unlike
  //  the upstream main our presets are applied after argument parsing)
}

static void applyMode(int mode) {
  // Mirrors mode= handling (main_dso_pangolin.cpp:421-445).
  if (mode == 1) {
    setting_photometricCalibration = 0;
    setting_affineOptModeA = 0;
    setting_affineOptModeB = 0;
  } else if (mode == 2) {
    setting_photometricCalibration = 0;
    setting_affineOptModeA = -1;
    setting_affineOptModeB = -1;
    setting_minGradHistAdd = 3;
  }
}

static void parseArg(const char* arg) {
  char buf[1000];
  int opt;
  if (1 == sscanf(arg, "files=%s", buf)) { a_files = buf; return; }
  if (1 == sscanf(arg, "calib=%s", buf)) { a_calib = buf; return; }
  if (1 == sscanf(arg, "gamma=%s", buf)) { a_gamma = buf; return; }
  if (1 == sscanf(arg, "vignette=%s", buf)) { a_vignette = buf; return; }
  if (1 == sscanf(arg, "masks=%s", buf)) { a_masks = buf; return; }
  if (1 == sscanf(arg, "color=%s", buf)) { a_colors = buf; return; }
  if (1 == sscanf(arg, "output=%s", buf)) { a_output = buf; return; }
  if (1 == sscanf(arg, "preset=%d", &opt)) { a_preset = opt; return; }
  if (1 == sscanf(arg, "mode=%d", &opt)) { a_mode = opt; return; }
  if (1 == sscanf(arg, "start=%d", &opt)) { a_start = opt; return; }
  if (1 == sscanf(arg, "end=%d", &opt)) { a_end = opt; return; }
  if (1 == sscanf(arg, "dense=%d", &opt)) { dense_track = opt; return; }
  if (1 == sscanf(arg, "planeOpt=%d", &opt)) { setPlaneOptimize = opt; return; }
  if (1 == sscanf(arg, "densemap=%d", &opt)) { denseMapping = opt; return; }
  if (1 == sscanf(arg, "tsdf=%d", &opt)) { setting_tsdf = opt; return; }
  if (1 == sscanf(arg, "lidar=%d", &opt)) { setting_useLidar = opt; return; }
  if (1 == sscanf(arg, "quiet=%d", &opt)) { setting_debugout_runquiet = opt; return; }
  if (1 == sscanf(arg, "nolog=%d", &opt)) { setting_logStuff = !opt; return; }
  fprintf(stderr, "unknown argument: %s\n", arg);
}

int main(int argc, char** argv) {
  // Headless defaults; the reference main leaves dense_track/setPlaneOptimize
  // at their settings.cpp values (1/true) unless dense=/planeOpt= is given.
  disableAllDisplay = true;
  setting_render_displayVideo = false;
  setting_render_displayDepth = false;
  setting_render_displayResidual = false;
  setting_render_displayCoarseTrackingFull = false;
  setting_render_plotTrackingFull = false;
  setting_render_renderWindowFrames = false;
  dense_track = 0;
  setPlaneOptimize = false;
  denseMapping = false;
  setting_logStuff = false;  // nolog=0 re-enables (logs/ must exist in cwd)

  for (int i = 1; i < argc; ++i) parseArg(argv[i]);
  applyPreset(a_preset);
  applyMode(a_mode);

  if (a_files.empty() || a_calib.empty()) {
    fprintf(stderr, "usage: nalo_ref files=<dir> calib=<file> [gamma= vignette= masks= "
                    "color= preset= mode= start= end= dense= planeOpt= output=]\n");
    return 2;
  }

  ImageFolderReader* reader =
      new ImageFolderReader(a_files, a_calib, a_gamma, a_vignette, a_masks, a_colors);
  reader->setGlobalCalibration();

  if (setting_photometricCalibration > 0 && reader->getPhotometricGamma() == 0) {
    fprintf(stderr, "ERROR: no photometric calibration; pass mode=1 or mode=2\n");
    return 2;
  }

  FullSystem* fullSystem = new FullSystem();
  fullSystem->setGammaFunction(reader->getPhotometricGamma());
  fullSystem->linearizeOperation = true;  // sequential: track+map in one thread

  const int n = reader->getNumImages();
  const int end = a_end < n ? a_end : n;

  struct timeval tv0;
  gettimeofday(&tv0, nullptr);

  int processed = 0;
  for (int i = a_start; i < end; ++i) {
    ImageAndExposure* img = reader->getImage(i);
    fullSystem->addActiveFrame(img, i);
    delete img;
    ++processed;

    if (fullSystem->initFailed || setting_fullResetRequested) {
      if (i - a_start < 250 || setting_fullResetRequested) {
        printf("RESETTING!\n");
        std::vector<IOWrap::Output3DWrapper*> wraps = fullSystem->outputWrapper;
        delete fullSystem;
        for (IOWrap::Output3DWrapper* ow : wraps) ow->reset();
        fullSystem = new FullSystem();
        fullSystem->setGammaFunction(reader->getPhotometricGamma());
        fullSystem->linearizeOperation = true;
        fullSystem->outputWrapper = wraps;
        setting_fullResetRequested = false;
      }
    }
    if (fullSystem->isLost) {
      printf("LOST at frame %d!\n", i);
      break;
    }
  }
  fullSystem->blockUntilMappingIsFinished();

  struct timeval tv1;
  gettimeofday(&tv1, nullptr);
  const double ms =
      (tv1.tv_sec - tv0.tv_sec) * 1000.0 + (tv1.tv_usec - tv0.tv_usec) / 1000.0;

  fullSystem->printResult(a_output);
  printf("\n=== %d frames in %.1f ms (%.2f fps, %.2f ms/frame) ===\n",
         processed, ms, processed * 1000.0 / ms, ms / processed);
  printf("result written to %s\n", a_output.c_str());

  delete fullSystem;
  delete reader;
  return 0;
}
