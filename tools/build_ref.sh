#!/bin/sh
# Build the reference ffmpeg binary at .refbuild/ffmpeg (the head-to-head
# baseline bench.py times).  Same recipe as .claude/skills/verify/SKILL.md;
# takes ~10 min on one vCPU.  Idempotent: exits 0 immediately if the
# binary already exists.
set -e
REPO="$(cd "$(dirname "$0")/.." && pwd)"
REF_SRC="${REF_SRC:-/root/reference}"
BUILD="$REPO/.refbuild"

if [ -x "$BUILD/ffmpeg" ]; then
    echo "refbuild: $BUILD/ffmpeg already present"
    exit 0
fi

mkdir -p "$BUILD"
cd "$BUILD"
"$REF_SRC/configure" --disable-everything --disable-autodetect \
    --disable-x86asm --disable-doc --disable-debug \
    --enable-encoder=ffv1,ffv2,rawvideo \
    --enable-decoder=ffv1,ffv2,rawvideo,ansi \
    --enable-muxer=avi,rawvideo,framecrc,md5,matroska,nut \
    --enable-demuxer=avi,rawvideo,matroska,nut \
    --enable-protocol=file,pipe --enable-filter=scale,format,null \
    --disable-ffplay --disable-ffprobe > configure.log 2>&1

# First make fails at link: ff_pvq_search_exact_avx is asm-only and x86asm
# is disabled.  Compile the C stand-in (greedy PVQ with |y_i| <= K-1 to
# dodge the reference's out-of-bounds CDF write) into libavcodec and
# relink.
make -j"$(nproc)" > make1.log 2>&1 || true
gcc -O2 -c "$REPO/tests/data/pvq_stub.c" -o pvq_stub.o
ar r libavcodec/libavcodec.a pvq_stub.o
make -j"$(nproc)" > make2.log 2>&1
test -x "$BUILD/ffmpeg"
echo "refbuild: built $BUILD/ffmpeg"
