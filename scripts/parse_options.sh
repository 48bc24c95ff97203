#!/bin/bash
# Generic --name value option parser (Kaldi-style, role-equivalent to the
# reference scripts/parse_options.sh): any shell variable already defined in
# the calling script can be overridden as `--variable-name value`; dashes in
# option names map to underscores.  Also supports `--config <file>` which is
# sourced in place.

while true; do
  [ -z "${1:-}" ] && break
  case "$1" in
    --config)
      [ $# -le 1 ] && { echo "$0: --config requires an argument" >&2; exit 1; }
      config_file=$2
      [ ! -r "$config_file" ] && { echo "$0: cannot read config '$config_file'" >&2; exit 1; }
      . "$config_file"
      shift 2
      ;;
    --help|-h)
      echo "usage: $0 [--option value ...]"
      exit 0
      ;;
    --*)
      name=$(echo "$1" | sed 's/^--//; s/-/_/g')
      # the variable must already exist in the calling script
      eval '[ -z "${'"$name"'+set}" ]' && {
        echo "$0: unknown option $1" >&2; exit 1; }
      [ $# -le 1 ] && { echo "$0: option $1 requires an argument" >&2; exit 1; }
      eval "$name"='"$2"'
      shift 2
      ;;
    *) break ;;
  esac
done
true
