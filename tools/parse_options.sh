# Minimal kaldi-style option parser: turns "--name value" args into
# shell variable assignments for variables that already exist.
# (Original implementation of the parse_options.sh contract used by the
# recipe run.sh scripts.)
while true; do
  [ -z "${1:-}" ] && break
  case "$1" in
    --*)
      name=$(echo "$1" | sed s/^--// | sed s/-/_/g)
      # variable must have been declared with a default
      eval '[ -z "${'"$name"'+set}" ]' && {
        echo "$0: invalid option $1" >&2
        exit 1
      }
      [ -z "${2:-}" ] && { echo "$0: missing value for $1" >&2; exit 1; }
      eval "$name=\"\$2\""
      shift 2
      ;;
    *) break ;;
  esac
done
true
