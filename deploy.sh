#!/usr/bin/env bash
# Build, push and roll out the serving stack (reference deploy.sh analog).
#
#   REGISTRY=my.registry/ns DEPLOY_HOST=ssh://user@host ./deploy.sh
#
# Builds the image via docker-bake.hcl tagged with the current commit, pushes
# it, and deploys swarm-config.yaml (per-language services behind traefik)
# onto the target swarm. Without DEPLOY_HOST the stack deploys locally.
set -euo pipefail

export COMMIT_SHA="$(git rev-parse --short HEAD)"
export REGISTRY="${REGISTRY:-localhost:5000}"

docker buildx bake -f docker-bake.hcl --push

DOCKER=(docker)
if [[ -n "${DEPLOY_HOST:-}" ]]; then
  DOCKER=(docker -H "${DEPLOY_HOST}")
fi

"${DOCKER[@]}" stack deploy --with-registry-auth \
  -c swarm-config.yaml pocket-tts-tpu
