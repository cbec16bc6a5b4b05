/* Headless harness around the reference TSDRLibrary: replay a recorded IQ
 * file through the original C pipeline and dump raw float frames, so the
 * TPU implementation's output can be diffed against the reference's
 * (SURVEY.md §7.8). Build + use: tests/test_parity_reference.py.
 *
 * usage: ref_harness <plugin.so> "<file rate fmt>" <height> <rate>
 *                    <out.bin> <max_frames> <skip_frames> [values.txt]
 * out.bin: per frame [int32 width][int32 height][float32 w*h]
 * values.txt (optional): one "id arg0 arg1" line per value callback, in
 * order — captures the autogain min/max trajectory (VALUE_ID_AUTOGAIN=3,
 * emitted every 7th frame per the dsp.c:231 runs++>5 quirk).
 */
#include "TSDRLibrary.h"
#include "TSDRCodes.h"
#include <pthread.h>
#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <unistd.h>

static FILE *out;
static volatile int frames_written = 0;
static int frames_seen = 0, max_frames = 0, skip = 0;
static tsdr_lib_t *tsdr;

static void framecb(float *buf, int width, int height, void *ctx) {
  frames_seen++;
  if (frames_seen > skip && frames_written < max_frames) {
    int32_t wh[2] = {width, height};
    fwrite(wh, sizeof(int32_t), 2, out);
    fwrite(buf, sizeof(float), (size_t)width * height, out);
    frames_written++;
  }
}

/* tsdr_stop joins the pipeline threads, so it must not be called from the
 * video thread (the frame callback) — poll from a watcher like the GUI's
 * separate control thread. */
static void *watcher(void *arg) {
  while (frames_written < max_frames) usleep(10000);
  tsdr_stop(tsdr);
  return NULL;
}
static FILE *valout = NULL;
static void valuecb(int id, double a0, double a1, void *ctx) {
  if (valout) fprintf(valout, "%d %.9g %.9g\n", id, a0, a1);
}
static void plotcb(int id, int off, double *v, int size, uint32_t sr, void *ctx) {}

int main(int argc, char **argv) {
  if (argc < 8) {
    fprintf(stderr, "usage: %s plugin params height rate out max skip\n", argv[0]);
    return 2;
  }
  tsdr_init(&tsdr, valuecb, plotcb, NULL);
  if (tsdr_loadplugin(tsdr, argv[1], argv[2]) != TSDR_OK) {
    fprintf(stderr, "loadplugin failed: %s\n", tsdr_getlasterrortext(tsdr));
    return 3;
  }
  tsdr_setresolution(tsdr, atoi(argv[3]), atof(argv[4]));
  out = fopen(argv[5], "wb");
  max_frames = atoi(argv[6]);
  skip = atoi(argv[7]);
  if (argc > 8) valout = fopen(argv[8], "w");
  /* deterministic configuration: no PLL/autoshift, estimator off */
  tsdr_setparameter_int(tsdr, PARAM_INT_FRAMERATE_PLL, 0);
  tsdr_setparameter_int(tsdr, PARAM_INT_AUTOSHIFT, 0);
  tsdr_setparameter_int(tsdr, PARAM_AUTOCORR_PLOTS_OFF, 1);
  pthread_t th;
  pthread_create(&th, NULL, watcher, NULL);
  tsdr_readasync(tsdr, framecb, NULL);
  pthread_join(th, NULL);
  fclose(out);
  if (valout) fclose(valout);
  fprintf(stderr, "wrote %d frames (saw %d)\n", frames_written, frames_seen);
  return frames_written == max_frames ? 0 : 4;
}
