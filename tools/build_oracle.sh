#!/bin/bash
# Build the reference gnuais binary (read-only at /root/reference) as the
# parity oracle, into the gitignored .oracle/ directory.  A stub ALSA
# header satisfies the soundcard code paths we never exercise (tests use
# file-input mode only, ais.c:173-186).
set -euo pipefail

REPO="$(cd "$(dirname "$0")/.." && pwd)"
REF="${REFERENCE_DIR:-/root/reference}"
OUT="$REPO/.oracle"
mkdir -p "$OUT/alsa" "$OUT/build" "$OUT/run"

cat > "$OUT/alsa/asoundlib.h" <<'EOF'
/* Minimal ALSA stub so the reference oracle binary links without
 * libasound.  Only file-input mode (-l) is exercised; these stubs
 * return errors if the soundcard path is ever taken. */
#ifndef STUB_ASOUNDLIB_H
#define STUB_ASOUNDLIB_H
#include <stddef.h>
#include <errno.h>
#include <string.h>
#include <stdlib.h>
#include <stdio.h>
typedef struct _snd_pcm snd_pcm_t;
typedef struct _snd_pcm_hw_params snd_pcm_hw_params_t;
typedef unsigned long snd_pcm_uframes_t;
typedef int snd_pcm_stream_t;
typedef int snd_pcm_access_t;
typedef int snd_pcm_format_t;
#define SND_PCM_STREAM_CAPTURE 1
#define SND_PCM_ACCESS_RW_INTERLEAVED 3
#define SND_PCM_FORMAT_S16_LE 2
#define snd_pcm_hw_params_alloca(p) (*(p) = (snd_pcm_hw_params_t *)0)
static inline int snd_pcm_open(snd_pcm_t **h, const char *n, snd_pcm_stream_t s, int m) { (void)h;(void)n;(void)s;(void)m; return -1; }
static inline const char *snd_strerror(int e) { (void)e; return "alsa-stub"; }
static inline int snd_pcm_hw_params_any(snd_pcm_t *h, snd_pcm_hw_params_t *p) { (void)h;(void)p; return -1; }
static inline int snd_pcm_hw_params_set_access(snd_pcm_t *h, snd_pcm_hw_params_t *p, snd_pcm_access_t a) { return -1; }
static inline int snd_pcm_hw_params_set_format(snd_pcm_t *h, snd_pcm_hw_params_t *p, snd_pcm_format_t f) { return -1; }
static inline int snd_pcm_hw_params_set_channels(snd_pcm_t *h, snd_pcm_hw_params_t *p, unsigned c) { return -1; }
static inline int snd_pcm_hw_params_set_rate_near(snd_pcm_t *h, snd_pcm_hw_params_t *p, unsigned *r, int *d) { return -1; }
static inline int snd_pcm_hw_params_set_period_size_near(snd_pcm_t *h, snd_pcm_hw_params_t *p, snd_pcm_uframes_t *s, int *d) { return -1; }
static inline int snd_pcm_hw_params(snd_pcm_t *h, snd_pcm_hw_params_t *p) { return -1; }
static inline int snd_pcm_hw_params_get_period_size(const snd_pcm_hw_params_t *p, snd_pcm_uframes_t *s, int *d) { return -1; }
static inline long snd_pcm_readi(snd_pcm_t *h, void *b, snd_pcm_uframes_t n) { return -1; }
static inline int snd_pcm_prepare(snd_pcm_t *h) { return -1; }
static inline int snd_pcm_close(snd_pcm_t *h) { return 0; }
#endif
EOF

cat > "$OUT/build/config.h" <<'EOF'
#define HAVE_ALSA 1
/* no MYSQL / CURL / PULSEAUDIO / GTK in the oracle build */
#define PACKAGE "gnuais"
#define VERSION "0.3.3"
EOF

SRCS=(ais cfg crc32 hlog input out_mysql receiver splay cache range cfgfile
      filter hmalloc out_json protodec rwlock serial spsymbol ipc)
FILES=()
for s in "${SRCS[@]}"; do FILES+=("$REF/src/$s.c"); done

gcc -O2 -w -fcommon -I"$OUT" -I"$OUT/build" -I"$REF/src" \
    -o "$OUT/build/gnuais_oracle" "${FILES[@]}" -lpthread -lm

# numeric-parity harness around the reference range math
cat > "$OUT/build/range_harness.c" <<'EOF'
/* Oracle harness for the reference range math (range.c), for numeric
 * parity testing of the rebuild's RangeTracker. */
#include <stdio.h>
#include <stdlib.h>
#include "range.h"
#include "protodec.h"
float mylat, mylng;
int have_my_loc = 1;
int hlog(int priority, const char *fmt, ...) { return 0; }
int main(int argc, char **argv)
{
    struct demod_state_t d = {0};
    d.chanid = 'A';
    mylat = lat2rad(atof(argv[1]));
    mylng = lon2rad(atof(argv[2]));
    for (int i = 3; i + 1 < argc; i += 2)
        update_range(&d, atof(argv[i]), atof(argv[i + 1]));
    printf("%.6f\n", d.best_range);
    return 0;
}
EOF
gcc -O2 -w -I"$OUT" -I"$OUT/build" -I"$REF/src" \
    -o "$OUT/build/range_harness" "$OUT/build/range_harness.c" \
    "$REF/src/range.c" -lm

echo "oracle built: $OUT/build/gnuais_oracle (+range_harness)"
