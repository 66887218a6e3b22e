PREFIX : <http://example/>
WITH :g DELETE DATA { :a :p :o }
